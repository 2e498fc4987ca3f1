"""Decisive probe for the fused-decoder lever: a scan-shaped Pallas
kernel where the weight block stays VMEM-resident across grid steps
(constant index_map), vs the XLA scan that re-streams the weight every
step. If residency works, us/step should drop from ~25 (stream-bound)
to MXU time (~2-6 us at B<=128).
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

IN, OUT, STEPS = 1664, 4096, 2000
B = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((IN, OUT)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, IN)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    # ---- XLA scan baseline (weight streamed per step) ------------------
    def xla_scan(x, w):
        def body(carry, _):
            wb = jax.lax.optimization_barrier(w)
            y = jnp.dot(carry, wb, preferred_element_type=jnp.float32)
            carry = (0.999 * carry
                     + 0.001 * y[:, :IN].astype(carry.dtype))
            return carry, ()
        out, _ = jax.lax.scan(body, x, None, length=STEPS)
        return out

    f = jax.jit(xla_scan)
    float(f(x, w).sum())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x, w).sum())
        ts.append(time.perf_counter() - t0)
    print(f"XLA scan (streamed)      : {min(ts)/STEPS*1e6:7.2f} us/step",
          flush=True)

    # ---- Pallas: whole scan in one kernel, weight resident -------------
    def kernel(x_ref, w_ref, o_ref, state):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            state[:] = x_ref[:]

        y = jnp.dot(state[:], w_ref[:], preferred_element_type=jnp.float32)
        state[:] = (0.999 * state[:].astype(jnp.float32)
                    + 0.001 * y[:, :IN]).astype(state.dtype)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = state[:]

    def pallas_scan(x, w):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((B, IN), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((IN, OUT), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, IN), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, IN), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((B, IN), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, w)

    g = jax.jit(pallas_scan)
    float(g(x, w).sum())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(x, w).sum())
        ts.append(time.perf_counter() - t0)
    print(f"Pallas scan (resident W) : {min(ts)/STEPS*1e6:7.2f} us/step",
          flush=True)


if __name__ == "__main__":
    main()
