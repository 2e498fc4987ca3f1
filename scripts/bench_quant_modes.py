"""One-off: AR throughput across quantization serving modes on the
real chip (fp32 / w8 / w4 [/ w8a8]).  Usage:
  python scripts/bench_quant_modes.py [B ...]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from flowtron_tpu.models import flowtron_init, flowtron_infer
    from flowtron_tpu.infer.quantize import quantize_flows_for_inference

    batches = [int(a) for a in sys.argv[1:]] or [64, 128]
    N, Tk, K = 400, 128, 4
    dims = dict(n_speakers=1, n_speaker_dim=128, n_text=185, n_text_dim=512,
                n_mel_channels=80, n_hidden=1024, n_attn_channels=640,
                n_lstm_layers=2, mel_encoder_n_hidden=512)
    params, cfg = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                use_gate_layer=True, **dims)

    def run(p, r, s, t):
        total = jnp.zeros((), jnp.float32)
        for _ in range(K):
            mel, _, _ = flowtron_infer(p, cfg, r, s, t, gate_threshold=1e6)
            total = total + jnp.sum(mel).astype(jnp.float32)
            r = 0.999 * r + 0.001 * mel
        return total

    infer = jax.jit(run)

    for B in batches:
        rng = np.random.default_rng(0)
        residual = jnp.asarray(
            (rng.standard_normal((B, 80, N)) * 0.5).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 185, (B, Tk)))
        sids = jnp.zeros((B,), jnp.int32)
        for mode in ["fp32", "w8", "w4"]:
            p = (params if mode == "fp32" else
                 quantize_flows_for_inference(params, mode=mode))
            float(infer(p, residual, sids, text))  # compile+warm
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(infer(p, residual, sids, text))
                times.append(time.perf_counter() - t0)
            fps = K * B * N / min(times)
            print(f"B={B:4d} {mode:5s}: {fps/1e3:8.1f}k frames/s "
                  f"({min(times)*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
