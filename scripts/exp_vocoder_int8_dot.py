"""Stage-1 probe for an int8 vocoder: time the WN's dominant matmul
shape as bf16 vs pre-quantized s8xs8 vs dynamic w8a8 (per-row int8
activations computed inside the loop).

The WN tc layout turns every conv into (B*T, 3C) @ (3C, 2C) with
B*T = 8 * 12800 = 102400 rows at the serving operating point — a
fully compute-bound MXU shape. v5e's int8 MXU is 2x bf16 TOPS, so IF
XLA lowers s8xs8 dot_general to it, the 85 ms bf16-roofline share of
the 133 ms vocoder dispatch could halve. This probe answers that
before any WN surgery.

Run: python scripts/exp_vocoder_int8_dot.py  (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M, K, N = 102400, 768, 512   # x_in @ w_cat at serving shapes
STEPS = 32


def timeit(fn, *args):
    float(jnp.asarray(fn(*args)).sum())  # compile + warm
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(jnp.asarray(fn(*args)).sum())
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e6  # us/step


def main():
    print("backend:", jax.default_backend())
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (M, K)).astype(jnp.bfloat16)
    w = jax.random.normal(kw, (K, N)).astype(jnp.bfloat16)
    x8 = jnp.round(jnp.clip(x.astype(jnp.float32) * 10, -127, 127)
                   ).astype(jnp.int8)
    w8 = jnp.round(jnp.clip(w.astype(jnp.float32) * 10, -127, 127)
                   ).astype(jnp.int8)
    flop = 2 * M * K * N

    @jax.jit
    def dot_bf16(x, w):
        def one(c, _):
            y = jnp.dot(c, w, preferred_element_type=jnp.float32)
            return c + y[:, :1].astype(jnp.bfloat16) * 1e-6, None
        c, _ = jax.lax.scan(one, x, None, length=STEPS)
        return c

    @jax.jit
    def dot_s8(x8, w8):
        acc = jnp.zeros((M, 1), jnp.float32)
        def one(c, _):
            y = jax.lax.dot_general(
                x8, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return c + y[:, :1].astype(jnp.float32) * 1e-6, None
        c, _ = jax.lax.scan(one, acc, None, length=STEPS)
        return c

    @jax.jit
    def dot_w8a8_dyn(x, w8):
        def one(c, _):
            # dynamic per-row symmetric int8 quantization of the acts
            s = jnp.max(jnp.abs(c.astype(jnp.float32)), axis=1,
                        keepdims=True) / 127.0
            q = jnp.round(c.astype(jnp.float32) / jnp.maximum(s, 1e-8)
                          ).astype(jnp.int8)
            y = jax.lax.dot_general(
                q, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (c + (y[:, :1].astype(jnp.float32) * s)[:, :1]
                    .astype(jnp.bfloat16) * 1e-6), None
        c, _ = jax.lax.scan(one, x, None, length=STEPS)
        return c

    @jax.jit
    def dot_w8a8_static(x, w8):
        # static activation scale (offline-calibrated): quantization is
        # a pure elementwise round+cast, no reduction on the hot path
        inv_s = jnp.float32(10.0)
        def one(c, _):
            q = jnp.round(jnp.clip(c.astype(jnp.float32) * inv_s,
                                   -127, 127)).astype(jnp.int8)
            y = jax.lax.dot_general(
                q, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return c + y[:, :1].astype(jnp.bfloat16) * 1e-6, None
        c, _ = jax.lax.scan(one, x, None, length=STEPS)
        return c

    for name, fn, args in (
            ("bf16", dot_bf16, (x, w)),
            ("s8xs8 (pre-quant)", dot_s8, (x8, w8)),
            ("w8a8 dynamic-act", dot_w8a8_dyn, (x, w8)),
            ("w8a8 static-scale", dot_w8a8_static, (x, w8))):
        try:
            us = timeit(fn, *args)
            print(f"{name:20s}: {us:8.1f} us/step "
                  f"({flop / (us * 1e-6) / 1e12:6.1f} TFLOP/s eff)",
                  flush=True)
        except Exception as e:
            print(f"{name:20s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
