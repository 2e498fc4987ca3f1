"""Attribute per-step cost inside the fused decoder kernel: time
stripped variants at flagship dims.  Usage: exp_fused_cost.py [B]
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
N, M, H, D, Tk = 400, 80, 1024, 640, 128
CHUNK = 16
CDT = jnp.bfloat16


def run(name, kernel_body, weight_shapes):
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.02
                      ).astype(CDT) for s in weight_shapes]
    z = jnp.asarray(rng.standard_normal((N, B, M)).astype(np.float32))
    kv = jnp.asarray(rng.standard_normal((B, Tk, D)).astype(np.float32)
                     ).astype(CDT)

    def kernel(z_ref, kv_ref, *rest):
        w_refs = rest[:len(ws)]
        mel_ref = rest[len(ws)]
        scratch = rest[len(ws) + 1:]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for s in scratch:
                s[:] = jnp.zeros_like(s)

        def step(ti, _):
            kernel_body(ti, z_ref, kv_ref, w_refs, mel_ref, scratch)
            return 0
        jax.lax.fori_loop(0, CHUNK, step, 0)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda t, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    f = pl.pallas_call(
        kernel,
        grid=(N // CHUNK,),
        in_specs=[pl.BlockSpec((CHUNK, B, M), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  const((B, Tk, D))] + [const(w.shape) for w in ws],
        out_specs=pl.BlockSpec((CHUNK, B, M), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, B, M), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),   # h
                        pltpu.VMEM((B, H), jnp.float32),   # h2
                        pltpu.VMEM((B, M), jnp.float32)],  # prev
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )
    g = jax.jit(lambda *a: f(*a))
    try:
        float(jnp.sum(g(z, kv, *ws)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(g(z, kv, *ws)))
            ts.append(time.perf_counter() - t0)
        print(f"{name:32s}: {min(ts)/N*1e6:7.2f} us/step", flush=True)
    except Exception as e:
        print(f"{name:32s}: FAIL {str(e).splitlines()[0][:90]}", flush=True)


# --- variant 1: 4 big LSTM-ish dots only, sequential through state ----
def v_dots(ti, z_ref, kv_ref, w, mel_ref, scratch):
    h, h2, prev = scratch
    x = prev[:].astype(CDT)                       # (B, M)
    a = jnp.dot(x, w[0][:], preferred_element_type=jnp.float32)      # M->4H
    a = a[:, :H] + jnp.dot(h[:].astype(CDT), w[1][:],
                           preferred_element_type=jnp.float32)[:, :H]
    h[:] = jnp.tanh(a)
    b2 = jnp.dot(h[:].astype(CDT), w[2][:], preferred_element_type=jnp.float32)
    h2[:] = jnp.tanh(b2[:, :H])
    out = jnp.dot(h2[:].astype(CDT), w[3][:],
                  preferred_element_type=jnp.float32)[:, :M]
    out = out + z_ref[ti].astype(jnp.float32)
    prev_new = out
    prev[:] = prev_new
    mel_ref[ti] = out


run("4 dots (26M params)", v_dots,
    [(M, 4 * H), (H, 4 * H), (H, 4 * H), (H, 4 * H)])


# --- variant 2: + full LSTM nonlinearities (sigmoid/tanh on 4H) -------
def v_lstm(ti, z_ref, kv_ref, w, mel_ref, scratch):
    h, h2, prev = scratch
    x = prev[:].astype(CDT)
    g1 = (jnp.dot(x, w[0][:], preferred_element_type=jnp.float32)
          + jnp.dot(h[:].astype(CDT), w[1][:],
                    preferred_element_type=jnp.float32))
    i = jax.nn.sigmoid(g1[:, :H])
    f_ = jax.nn.sigmoid(g1[:, H:2 * H])
    gg = jnp.tanh(g1[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(g1[:, 3 * H:])
    c = f_ * h[:] + i * gg
    h[:] = o * jnp.tanh(c)
    g2 = (jnp.dot(h[:].astype(CDT), w[2][:], preferred_element_type=jnp.float32)
          + jnp.dot(h2[:].astype(CDT), w[3][:],
                    preferred_element_type=jnp.float32))
    h2[:] = jax.nn.sigmoid(g2[:, :H]) * jnp.tanh(g2[:, H:2 * H])
    out = jnp.dot(h2[:].astype(CDT), w[4][:],
                  preferred_element_type=jnp.float32)[:, :M]
    out = out + z_ref[ti].astype(jnp.float32)
    prev[:] = out
    mel_ref[ti] = out


run("2 LSTM cells + out dot", v_lstm,
    [(M, 4 * H), (H, 4 * H), (H, 4 * H), (H, 4 * H), (H, M if M % 128 == 0
                                                      else 128)])


# --- variant 3: attention only ----------------------------------------
def v_attn(ti, z_ref, kv_ref, w, mel_ref, scratch):
    h, h2, prev = scratch
    q = jnp.dot(prev[:].astype(CDT), w[0][:],
                preferred_element_type=jnp.float32)       # (B, D)... M->D
    tanh_in = q[:, None, :].astype(CDT) + kv_ref[:]
    scores = jnp.sum(jnp.tanh(tanh_in).astype(jnp.float32), axis=-1)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jnp.sum(attn[:, :, None].astype(CDT) * kv_ref[:], axis=1)
    out = ctx[:, :M].astype(jnp.float32) + z_ref[ti].astype(jnp.float32)
    prev[:] = out
    mel_ref[ti] = out


run("attention only", v_attn, [(M, D)])

if __name__ == "__main__":
    pass
