"""Probe: int8 weights INSIDE the VMEM-resident fused decoder kernel.

ROADMAP round-3 candidate 5. The B=1 fused-decoder floor was measured at
~64 us/step for the bare big dots with bf16 weights already in VMEM —
attributed to MXU weight-TILE LOADING (a 128x128 tile load costs ~a full
128-row pass, and at B<128 rows there is no reuse). Hypothesis: int8
weight tiles halve the bytes per tile load AND halve the VMEM residency
(26.5 MB/flow), so an int8x int8 MXU path (per-step dynamic activation
quantization, B=1 row — trivial VPU work) could move the floor.

Measures, on the real TPU, a scan-shaped kernel running the decoder's
big-dot chain (1664x4096 -> 3 x 1024x4096) per step with weights
resident in VMEM scratch (one-time HBM->VMEM DMA, as in
ops/decoder_pallas.py):
  - bf16 : bf16 weights, bf16 x f32-accum dots      (today's kernel)
  - w8a8 : int8 weights + per-column scales, per-step int8 activation
           quantization, int8 x int8 -> int32 dots

Run: python scripts/exp_fused_int8.py [B] [STEPS]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
SHAPES = [(1664, 4096), (1024, 4096), (1024, 4096), (1024, 4096)]


def _consume_gates(y, out_width):
    """LSTM-gate-shaped combine that CONSUMES every output column of the
    4096-wide dot (a plain [:, :k] slice would let Mosaic narrow the dot
    itself, making the probe unfaithful to the real kernel)."""
    import jax
    h4 = y.shape[1] // 4
    h = (jax.nn.sigmoid(y[:, :h4]) * jnp.tanh(y[:, h4:2 * h4])
         + jax.nn.sigmoid(y[:, 2 * h4:3 * h4]) * jnp.tanh(y[:, 3 * h4:]))
    reps = -(-out_width // h4)
    return jnp.tile(h, (1, reps))[:, :out_width].astype(jnp.float32)


def _time(f, *args):
    out = f(*args)
    float(jnp.sum(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / STEPS * 1e6  # us/step


def make_bf16():
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.02
                      ).astype(jnp.bfloat16) for s in SHAPES]
    x0 = jnp.asarray(rng.standard_normal((B, SHAPES[0][0]))
                     .astype(np.float32)).astype(jnp.bfloat16)

    def kernel(x_ref, *refs):
        n = len(SHAPES)
        hbm = refs[:n]
        o_ref = refs[n]
        res = refs[n + 1:n + 1 + n]
        state = refs[n + 1 + n]
        sems = refs[-1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for i, (src, dst) in enumerate(zip(hbm, res)):
                pltpu.make_async_copy(src, dst, sems.at[i]).start()
            for i, (src, dst) in enumerate(zip(hbm, res)):
                pltpu.make_async_copy(src, dst, sems.at[i]).wait()
            state[:] = x_ref[:].astype(jnp.float32)

        h = state[:]
        for i, w in enumerate(res):
            y = jnp.dot(h[:, :SHAPES[i][0]].astype(jnp.bfloat16), w[:],
                        preferred_element_type=jnp.float32)
            h = _consume_gates(y, state.shape[1])
        state[:] = 0.999 * state[:] + 0.001 * h
        o_ref[:] = state[:]

    def run(x, *ws):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((B, SHAPES[0][0]), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)] +
                     [pl.BlockSpec(memory_space=pl.ANY) for _ in SHAPES],
            out_specs=pl.BlockSpec((B, SHAPES[0][0]), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, SHAPES[0][0]), jnp.float32),
            scratch_shapes=[pltpu.VMEM(s, jnp.bfloat16) for s in SHAPES] +
                           [pltpu.VMEM((B, SHAPES[0][0]), jnp.float32),
                            pltpu.SemaphoreType.DMA((len(SHAPES),))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
        )(x, *ws)

    return jax.jit(run), (x0, *ws)


def make_w8a8():
    rng = np.random.default_rng(0)
    ws, scales = [], []
    for s in SHAPES:
        w = rng.standard_normal(s).astype(np.float32) * 0.02
        sc = np.abs(w).max(axis=0) / 127.0 + 1e-12     # per-column
        ws.append(jnp.asarray(np.round(w / sc).astype(np.int8)))
        scales.append(jnp.asarray(sc.astype(np.float32)[None]))  # (1, out)
    x0 = jnp.asarray(rng.standard_normal((B, SHAPES[0][0]))
                     .astype(np.float32))

    def kernel(x_ref, *refs):
        n = len(SHAPES)
        hbm = refs[:2 * n]
        o_ref = refs[2 * n]
        res = refs[2 * n + 1:2 * n + 1 + 2 * n]
        state = refs[2 * n + 1 + 2 * n]
        sems = refs[-1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for i, (src, dst) in enumerate(zip(hbm, res)):
                pltpu.make_async_copy(src, dst, sems.at[i]).start()
            for i, (src, dst) in enumerate(zip(hbm, res)):
                pltpu.make_async_copy(src, dst, sems.at[i]).wait()
            state[:] = x_ref[:].astype(jnp.float32)

        w_res = res[:n]
        s_res = res[n:]
        h = state[:]
        for i in range(n):
            hx = h[:, :SHAPES[i][0]]
            # dynamic per-row activation quantization (B rows, cheap)
            sx = jnp.max(jnp.abs(hx), axis=1, keepdims=True) / 127.0 + 1e-12
            q = jnp.round(hx / sx).astype(jnp.int8)
            acc = jnp.dot(q, w_res[i][:],
                          preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * sx * s_res[i][:]
            h = _consume_gates(y, state.shape[1])
        state[:] = 0.999 * state[:] + 0.001 * h
        o_ref[:] = state[:]

    def run(x, *wss):
        n = len(SHAPES)
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((B, SHAPES[0][0]), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)] +
                     [pl.BlockSpec(memory_space=pl.ANY)
                      for _ in range(2 * n)],
            out_specs=pl.BlockSpec((B, SHAPES[0][0]), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, SHAPES[0][0]), jnp.float32),
            scratch_shapes=[pltpu.VMEM(s, jnp.int8) for s in SHAPES] +
                           [pltpu.VMEM((1, s[1]), jnp.float32)
                            for s in SHAPES] +
                           [pltpu.VMEM((B, SHAPES[0][0]), jnp.float32),
                            pltpu.SemaphoreType.DMA((2 * len(SHAPES),))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
        )(x, *wss)

    return jax.jit(run), (x0, *ws, *scales)


def main():
    print(f"B={B} STEPS={STEPS} backend={jax.default_backend()}")
    f, args = make_bf16()
    print(f"bf16 resident dots : {_time(f, *args):7.2f} us/step",
          flush=True)
    f, args = make_w8a8()
    print(f"w8a8 resident dots : {_time(f, *args):7.2f} us/step",
          flush=True)


if __name__ == "__main__":
    main()
