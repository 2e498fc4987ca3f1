"""Decompose the serving fused dispatch (B=8, 400 mel frames, bf16):
AR mel synthesis vs WaveGlow vocode vs the glue, against the vocoder's
MXU roofline, to see where the remaining serving milliseconds live.

Chained-pass methodology from bench.py (the tunnel adds ~27 ms per
dispatch; chaining N passes in one program amortizes it).

Run: python scripts/exp_vocoder_breakdown.py  (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flowtron_tpu.models import flowtron_init, flowtron_infer
from flowtron_tpu.vocoder import waveglow_init
from flowtron_tpu.vocoder.waveglow import waveglow_infer, _upsample_mel

B, N_FRAMES, PASSES = 8, 400, 4
DT = jnp.bfloat16


def timed(fn, *args):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())  # sync via scalar fetch
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].sum())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.default_backend())
    dims = dict(n_speakers=1, n_speaker_dim=128, n_text=185,
                n_text_dim=512, n_mel_channels=80, n_hidden=1024,
                n_attn_channels=640, n_lstm_layers=2,
                mel_encoder_n_hidden=512)
    params, static_cfg = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                       use_gate_layer=True, **dims)
    params = jax.tree.map(
        lambda x: x.astype(DT) if x.dtype == jnp.float32 else x, params)
    wgp, wgc = waveglow_init(jax.random.PRNGKey(1))
    wgp = jax.tree.map(
        lambda x: x.astype(DT) if x.dtype == jnp.float32 else x, wgp)

    key = jax.random.PRNGKey(0)
    residual = (jax.random.normal(key, (B, 80, N_FRAMES)) * 0.5).astype(DT)
    text = jnp.tile(jnp.arange(64)[None], (B, 1))
    sids = jnp.zeros((B,), jnp.int32)
    mel = (jax.random.normal(key, (B, 80, N_FRAMES)) * 1.0).astype(DT)
    z_audio = jax.random.normal(key, (B, N_FRAMES * 256)).astype(DT)

    @jax.jit
    def synth_only(params, residual):
        def one(r, _):
            m, _, _ = flowtron_infer(params, static_cfg, r, sids, text,
                                     gate_threshold=0.5)
            return m.astype(DT), None
        out, _ = jax.lax.scan(one, residual, None, length=PASSES)
        return out

    @jax.jit
    def vocode_only(wgp, mel):
        def one(m, _):
            a = waveglow_infer(wgp, wgc, m, sigma=0.8,
                               key=jax.random.PRNGKey(1))
            # feed audio energy back into the next mel so passes chain
            return (m + a[:, :80 * N_FRAMES].reshape(B, 80, N_FRAMES)
                    * 1e-6).astype(DT), None
        out, _ = jax.lax.scan(one, mel, None, length=PASSES)
        return out

    @jax.jit
    def upsample_only(wgp, mel):
        def one(m, _):
            u = _upsample_mel(wgp, m, wgc["n_group"], N_FRAMES * 256)
            return (m + u[:, :80, :N_FRAMES] * 1e-6).astype(DT), None
        out, _ = jax.lax.scan(one, mel, None, length=PASSES)
        return out

    t_synth = timed(synth_only, params, residual) / PASSES
    t_voc = timed(vocode_only, wgp, mel) / PASSES
    t_up = timed(upsample_only, wgp, mel) / PASSES

    # vocoder FLOPs at these dims (per batch pass), counting matmul MACs*2
    T_g = N_FRAMES * 256 // wgc["n_group"]
    C = wgc["n_channels"]
    L = wgc["n_layers"]
    spect_c = 80 * wgc["n_group"]
    n_half_tot = 0
    n_rem = wgc["n_group"]
    flops = 0.0
    for k in range(wgc["n_flows"]):
        if k % wgc["n_early_every"] == 0 and k > 0:
            n_rem -= wgc["n_early_size"]
        n_half = n_rem // 2
        flops += 2 * B * T_g * spect_c * (2 * C * L)          # cond
        flops += 2 * B * T_g * n_half * C                     # start
        flops += L * 2 * B * T_g * (3 * C) * (2 * C)          # in_layers
        flops += (L - 1) * 2 * B * T_g * C * (2 * C) \
            + 2 * B * T_g * C * (2 * C)                       # res_skip
        flops += 2 * B * T_g * C * (2 * n_half)               # end
        flops += 2 * B * T_g * n_rem * n_rem                  # 1x1 inv
        n_half_tot += n_half
    up_flops = 2 * B * N_FRAMES * 80 * (640 * 256)            # upsample mm
    print(f"AR synth (2 flows, scan): {t_synth * 1e3:7.1f} ms/pass")
    print(f"vocode (12-flow WaveGlow): {t_voc * 1e3:6.1f} ms/pass")
    print(f"upsample alone:            {t_up * 1e3:6.1f} ms/pass")
    print(f"vocoder matmul FLOPs: {flops / 1e12:.2f} TFLOP "
          f"(+ upsample {up_flops / 1e9:.1f} GFLOP)")
    print(f"roofline @197 TFLOP/s bf16: {flops / 197e12 * 1e3:.1f} ms "
          f"-> measured/roofline = {t_voc / (flops / 197e12):.2f}x")


if __name__ == "__main__":
    main()
