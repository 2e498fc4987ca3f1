"""Stage-2 probe for an int8 vocoder: a realistic 4-layer gated WN
block, bf16 vs static-scale w8a8 where the activation quantization is
FUSED into the producers (the gate epilogue writes int8 directly; the
residual add writes bf16 carry + int8 copy), plus an int8
conv_general_dilated variant of the nch layout.

The stage-1 scan probe showed s8xs8 dot_general is exactly 2x bf16 on
the MXU, but a standalone round+cast of the activation re-reads it from
HBM and eats the win. Here the quantize is an epilogue of ops whose
output had to be materialized anyway, so int8 REPLACES bf16 traffic
instead of adding to it — the question is whether XLA fuses it that way.

Run: python scripts/exp_vocoder_int8_wn.py  (real TPU)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, T, C = 8, 12800, 256     # serving operating point (400 mel frames)
L = 4                       # layers per probe block (12 flows x 8 in real)
REPS = 2                    # chained blocks per dispatch


def q8(x, inv_s):
    return jnp.round(jnp.clip(x.astype(jnp.float32) * inv_s,
                              -127, 127)).astype(jnp.int8)


def shift_t(x, d):
    Tn = x.shape[1]
    if d > 0:
        return jnp.pad(x, ((0, 0), (d, 0), (0, 0)))[:, :Tn]
    return jnp.pad(x, ((0, 0), (0, -d), (0, 0)))[:, -d:]


def make_weights(key, dtype):
    ks = jax.random.split(key, 2 * L)
    win = [jax.random.normal(ks[2 * i], (3 * C, 2 * C)).astype(dtype) * 0.05
           for i in range(L)]
    wrs = [jax.random.normal(ks[2 * i + 1], (C, 2 * C)).astype(dtype) * 0.05
           for i in range(L)]
    return win, wrs


def block_tc_bf16(win, wrs, x):  # bf16 accumulate == real _conv1d
    out = jnp.zeros((B, T, C), jnp.float32)
    for l in range(L):
        d = 2 ** l
        x_in = jnp.concatenate([shift_t(x, d), x, shift_t(x, -d)], -1)
        acts = jnp.dot(x_in, win[l], preferred_element_type=jnp.bfloat16)
        z = jnp.tanh(acts[..., :C]) * jax.nn.sigmoid(acts[..., C:])
        rs = jnp.dot(z, wrs[l], preferred_element_type=jnp.bfloat16)
        x = x + rs[..., :C]
        out = out + rs[..., C:].astype(jnp.float32)
    return x, out


def block_tc_w8a8(win8, wrs8, x):
    """Static scales: x quantized at the residual-add epilogue, z at the
    gate epilogue (bounded [-1,1] -> exact scale 127)."""
    out = jnp.zeros((B, T, C), jnp.float32)
    xq = q8(x, 16.0)                     # producer epilogue in real code
    for l in range(L):
        d = 2 ** l
        x_in = jnp.concatenate([shift_t(xq, d), xq, shift_t(xq, -d)], -1)
        acts = jax.lax.dot_general(
            x_in, win8[l], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * (
                1 / (16.0 * 127.0))
        z8 = q8(jnp.tanh(acts[..., :C]) * jax.nn.sigmoid(acts[..., C:]),
                127.0)
        rs = jax.lax.dot_general(
            z8, wrs8[l], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * (
                1 / (127.0 * 127.0))
        x = x.astype(jnp.float32) + rs[..., :C]
        xq = q8(x, 16.0)
        x = x.astype(jnp.bfloat16)
        out = out + rs[..., C:]
    return x, out


def block_nch_bf16(win, wrs, x_nch):
    # win as (2C, C, 3) convs, wrs as (2C, C, 1)
    out = jnp.zeros((B, C, T), jnp.float32)
    for l in range(L):
        d = 2 ** l
        acts = jax.lax.conv_general_dilated(
            x_nch, win[l], (1,), [(d, d)], rhs_dilation=(d,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.bfloat16)
        z = jnp.tanh(acts[:, :C]) * jax.nn.sigmoid(acts[:, C:])
        rs = jax.lax.conv_general_dilated(
            z, wrs[l], (1,), [(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.bfloat16)
        x_nch = x_nch + rs[:, :C]
        out = out + rs[:, C:].astype(jnp.float32)
    return x_nch, out


def block_nch_int8(win8, wrs8, x_nch):
    out = jnp.zeros((B, C, T), jnp.float32)
    xq = q8(x_nch, 16.0)
    for l in range(L):
        d = 2 ** l
        acts = jax.lax.conv_general_dilated(
            xq, win8[l], (1,), [(d, d)], rhs_dilation=(d,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.int32).astype(jnp.float32) * (
                1 / (16.0 * 127.0))
        z8 = q8(jnp.tanh(acts[:, :C]) * jax.nn.sigmoid(acts[:, C:]),
                127.0)
        rs = jax.lax.conv_general_dilated(
            z8, wrs8[l], (1,), [(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.int32).astype(jnp.float32) * (
                1 / (127.0 * 127.0))
        x_nch = x_nch.astype(jnp.float32) + rs[:, :C]
        xq = q8(x_nch, 16.0)
        x_nch = x_nch.astype(jnp.bfloat16)
        out = out + rs[:, C:]
    return x_nch, out


def timeit(fn, *args):
    float(jnp.asarray(fn(*args)[1]).sum())
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(jnp.asarray(fn(*args)[1]).sum())
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3  # ms per block


def chained(block, win, wrs, x):
    o = jnp.zeros(x.shape[:2] + (C,), jnp.float32) \
        if x.shape[-1] == C else jnp.zeros((B, C, T), jnp.float32)
    for _ in range(REPS):
        x, oo = block(win, wrs, x)
        o = o + oo
    return x, o


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    win, wrs = make_weights(key, jnp.bfloat16)
    win8 = [q8(w, 127.0 / 0.2) for w in win]
    wrs8 = [q8(w, 127.0 / 0.2) for w in wrs]
    x_tc = jax.random.normal(key, (B, T, C)).astype(jnp.bfloat16) * 0.5

    # nch layouts: weights (2C, C/3C, k)
    win_n = [w.T.reshape(2 * C, 3, C).transpose(0, 2, 1) for w in win]
    wrs_n = [w.T[:, :, None] for w in wrs]
    win_n8 = [q8(w, 127.0 / 0.2) for w in win_n]
    wrs_n8 = [q8(w, 127.0 / 0.2) for w in wrs_n]
    x_n = x_tc.transpose(0, 2, 1)

    flop = REPS * L * 2 * B * T * (3 * C * 2 * C + C * 2 * C)
    for name, block, w1, w2, xx in (
            ("tc  bf16", block_tc_bf16, win, wrs, x_tc),
            ("tc  w8a8-static", block_tc_w8a8, win8, wrs8, x_tc),
            ("nch bf16", block_nch_bf16, win_n, wrs_n, x_n),
            ("nch int8-conv", block_nch_int8, win_n8, wrs_n8, x_n)):
        try:
            fn = jax.jit(partial(chained, block))
            ms = timeit(fn, w1, w2, xx)
            print(f"{name:16s}: {ms:7.2f} ms/block "
                  f"({flop / REPS / (ms * 1e-3) / 1e12:6.1f} TFLOP/s)",
                  flush=True)
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
