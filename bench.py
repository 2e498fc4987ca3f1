"""Benchmark: AR mel-synthesis throughput on the flagship (LJS 2-flow,
1024-hidden) model — the BASELINE.json north-star metric.

Prints ONE JSON line:
  {"metric": "mel_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 2870}

Baseline anchor: RTF 0.03 on a v5e chip = 22050/256/0.03 ~= 2870 frames/s
(see BASELINE.md). Runs on whatever the default JAX backend is (the real
TPU under the driver; CPU if forced).
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# first compile over the axon tunnel is ~8 min; persist it across runs
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_FRAMES_PER_SEC = 22050.0 / 256.0 / 0.03  # ≈ 2871


def main():
    from flowtron_tpu.models import flowtron_init, flowtron_infer

    B = int(__import__("os").environ.get("BENCH_BATCH", "64"))
    N = 400          # reference's default inference op point
    Tk = 128

    dims = dict(n_speakers=1, n_speaker_dim=128, n_text=185, n_text_dim=512,
                n_mel_channels=80, n_hidden=1024, n_attn_channels=640,
                n_lstm_layers=2, mel_encoder_n_hidden=512)
    params, cfg = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                use_gate_layer=True, **dims)

    rng = np.random.default_rng(0)
    residual = jnp.asarray(
        (rng.standard_normal((B, 80, N)) * 0.5).astype(np.float32))
    text = jnp.asarray(rng.integers(1, 185, (B, Tk)))
    sids = jnp.zeros((B,), jnp.int32)

    # K chained synthesis passes per dispatch: the dev tunnel adds a fixed
    # ~27 ms round-trip per jitted call, which would otherwise be billed
    # to the chip. Chaining amortizes it (each pass consumes the previous
    # pass's output so XLA cannot parallelize or elide them).
    K = 4

    def run(p, r, s, t):
        total = jnp.zeros((), jnp.float32)
        for _ in range(K):
            mel, _, _ = flowtron_infer(p, cfg, r, s, t, gate_threshold=1e6)
            total = total + jnp.sum(mel).astype(jnp.float32)
            r = 0.999 * r + 0.001 * mel
        return total

    infer = jax.jit(run)

    # warmup / compile. NOTE: under the axon tunnel block_until_ready does
    # not wait for remote completion — fetch a scalar to force real sync.
    float(infer(params, residual, sids, text))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(infer(params, residual, sids, text))
        times.append(time.perf_counter() - t0)

    dt = min(times)
    frames_per_sec = K * B * N / dt

    # secondary: int8 weight-only serving mode (fp32 activations;
    # quality bound tested in tests/test_quantize.py)
    from flowtron_tpu.infer.quantize import quantize_flows_for_inference
    qparams = quantize_flows_for_inference(params)
    float(infer(qparams, residual, sids, text))
    t0 = time.perf_counter()
    float(infer(qparams, residual, sids, text))
    int8_fps = K * B * N / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "mel_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 3),
        "detail": {"batch": B, "n_frames": N, "chained_passes": K,
                   "seconds": round(dt, 4),
                   "backend": jax.default_backend(), "dtype": "fp32",
                   "rtf_batch_wallclock": round(dt / (K * N * 256 / 22050), 4),
                   "int8_weights_frames_per_sec": round(int8_fps, 1)},
    }))


if __name__ == "__main__":
    main()
