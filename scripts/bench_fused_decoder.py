"""Benchmark the fused VMEM-resident decoder kernel vs the lax.scan path
at flagship dims.  Usage: python scripts/bench_fused_decoder.py [B ...]
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
    from flowtron_tpu.models.ar_step import ar_step_params, ar_step_infer
    from flowtron_tpu.models.attention import attention_precompute
    from flowtron_tpu.ops.decoder_pallas import (
        pack_flow_weights, fused_flow_infer)

    batches = [int(a) for a in sys.argv[1:]] or [1, 8, 64]
    N, Tk, M = 400, 128, 80

    p = ar_step_params(jax.random.PRNGKey(0), n_mel_channels=M,
                       n_speaker_dim=128, n_text_channels=512,
                       n_hidden=1024, n_attn_channels=640, n_lstm_layers=2,
                       add_gate=True)
    p["conv"]["w"] = 0.01 * jax.random.normal(jax.random.PRNGKey(1),
                                              p["conv"]["w"].shape)

    for B in batches:
        rng = np.random.default_rng(0)
        residual = jnp.asarray(
            rng.standard_normal((N, B, M)).astype(np.float32) * 0.5)
        text = jnp.asarray(
            rng.standard_normal((Tk, B, 640)).astype(np.float32))

        # --- lax.scan path (bf16 weights for a fair serving comparison)
        p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
        scan = jax.jit(lambda pp, r, t: ar_step_infer(
            pp, r.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
            gate_threshold=1e6)[0])
        try:
            float(jnp.sum(scan(p16, residual, text)).astype(jnp.float32))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(scan(p16, residual, text)
                              ).astype(jnp.float32))
                ts.append(time.perf_counter() - t0)
            us = min(ts) / N * 1e6
            print(f"B={B:4d} scan bf16 : {us:8.2f} us/step "
                  f"({B*N/min(ts)/1e3:8.1f}k frames/s)", flush=True)
        except Exception as e:
            print(f"B={B:4d} scan bf16 : FAIL "
                  f"{str(e).splitlines()[0][:90]}", flush=True)

        # --- fused kernel
        w = pack_flow_weights(p, dtype=jnp.bfloat16)
        kp, vals = attention_precompute(p["attention_layer"], text, text)
        km = jnp.ones((B, Tk), jnp.float32)

        fused = jax.jit(lambda ww, r, k, v, m: fused_flow_infer(
            ww, r, k, v, m, 1.0)[0])
        try:
            float(jnp.sum(fused(w, residual, kp, vals, km)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(fused(w, residual, kp, vals, km)))
                ts.append(time.perf_counter() - t0)
            us = min(ts) / N * 1e6
            print(f"B={B:4d} fused     : {us:8.2f} us/step "
                  f"({B*N/min(ts)/1e3:8.1f}k frames/s)", flush=True)
        except Exception as e:
            print(f"B={B:4d} fused     : FAIL "
                  f"{str(e).splitlines()[0][:110]}", flush=True)

        # numeric cross-check at this batch
        try:
            mel_s = scan(p16, residual, text)
            mel_f = fused(w, residual, kp, vals, km)
            err = float(jnp.max(jnp.abs(mel_f - mel_s.astype(jnp.float32))))
            print(f"B={B:4d} |fused-scan| max: {err:.4f}", flush=True)
        except Exception:
            pass


if __name__ == "__main__":
    main()
