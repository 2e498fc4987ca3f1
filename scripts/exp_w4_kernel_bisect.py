"""Bisect which op in the w4 Pallas kernel Mosaic rejects."""
import sys
import os
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

IN, OUT, B, TN = 1664, 4096, 64, 512
G, NG = 128, 13


def build(kernel):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, IN)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    q4 = jnp.asarray(rng.integers(-128, 128, (IN // 2, OUT)).astype(np.int8))
    s = jnp.asarray(rng.uniform(0.01, 0.1, (NG, OUT)).astype(np.float32))
    f = pl.pallas_call(
        kernel,
        grid=(OUT // TN,),
        in_specs=[
            pl.BlockSpec((B, IN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IN // 2, TN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NG, TN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OUT), jnp.bfloat16),
    )
    return f, (x, q4, s)


def try_(name, kernel):
    try:
        f, args = build(kernel)
        out = jax.jit(f)(*args)
        print(f"{name}: OK {float(out.sum()):.3f}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name}: FAIL {msg}", flush=True)


# 1. shifts only (i32), dot with lo
def k1(x_ref, q_ref, s_ref, o_ref):
    q = q_ref[:].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(q, 28), 28).astype(x_ref.dtype)
    acc = jnp.dot(x_ref[:, : IN // 2], lo, preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


# 2. + concat
def k2(x_ref, q_ref, s_ref, o_ref):
    q = q_ref[:].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(q, 28), 28)
    hi = jnp.right_shift(q, 4)
    w4 = jnp.concatenate([lo, hi], 0).astype(x_ref.dtype)
    acc = jnp.dot(x_ref[:], w4, preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


# 3. + group-scale via 3-D reshape
def k3(x_ref, q_ref, s_ref, o_ref):
    q = q_ref[:].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(q, 28), 28)
    hi = jnp.right_shift(q, 4)
    w4 = jnp.concatenate([lo, hi], 0).astype(x_ref.dtype)
    w4 = (w4.reshape(NG, G, TN) * s_ref[:].astype(x_ref.dtype
                                                  ).reshape(NG, 1, TN)
          ).reshape(IN, TN)
    acc = jnp.dot(x_ref[:], w4, preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


# 4. group scale via repeat (no 3-D reshape)
def k4(x_ref, q_ref, s_ref, o_ref):
    q = q_ref[:].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(q, 28), 28)
    hi = jnp.right_shift(q, 4)
    w4 = jnp.concatenate([lo, hi], 0).astype(x_ref.dtype)
    sfull = pltpu.repeat(s_ref[:].astype(x_ref.dtype), G, 0)  # (NG*G, TN)
    acc = jnp.dot(x_ref[:], w4 * sfull, preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


# 5. per-group dots, scale on the (B, TN) accumulator
def k5(x_ref, q_ref, s_ref, o_ref):
    q = q_ref[:].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(q, 28), 28).astype(x_ref.dtype)
    hi = jnp.right_shift(q, 4).astype(x_ref.dtype)
    acc = jnp.zeros_like(o_ref, jnp.float32)
    half = IN // 2
    # G=128 groups straddle the halves boundary for IN=1664; use 64-row
    # sub-blocks, two per group, scale applied per sub-block
    for blk in range(IN // 64):
        src = lo if blk < half // 64 else hi
        r0 = (blk % (half // 64)) * 64
        wblk = src[r0:r0 + 64]
        gi = blk // 2
        acc = acc + jnp.dot(x_ref[:, blk * 64:(blk + 1) * 64], wblk,
                            preferred_element_type=jnp.float32
                            ) * s_ref[gi]
    o_ref[:] = acc.astype(o_ref.dtype)


def time_in_scan(name, kernel, steps=2000):
    import time
    f, (x, q4, s) = build(kernel)

    def run(x, q4, s):
        def body(carry, _):
            y = f(carry, q4, s)
            carry = 0.999 * carry + 0.001 * y[:, :IN].astype(carry.dtype)
            return carry, ()
        out, _ = jax.lax.scan(body, x, None, length=steps)
        return out

    g = jax.jit(run)
    try:
        float(g(x, q4, s).sum())
    except Exception as e:
        print(f"{name} scan: FAIL {str(e).splitlines()[0][:110]}", flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(x, q4, s).sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name} scan: {min(ts)/steps*1e6:7.2f} us/step", flush=True)


if __name__ == "__main__":
    try_("k1 shifts+dot-half", k1)
    try_("k2 +concat", k2)
    try_("k3 +reshape3d-scale", k3)
    try_("k4 +repeat-scale", k4)
    try_("k5 per-group dots", k5)
    time_in_scan("k3 reshape3d", k3)
    time_in_scan("k5 per-group", k5)
