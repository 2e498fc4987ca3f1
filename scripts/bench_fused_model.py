"""Full-model flowtron_infer: fused kernel vs lax.scan at flagship dims
(bf16 serving params).  Usage: bench_fused_model.py [B ...]
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

    batches = [int(a) for a in sys.argv[1:]] or [1, 8]
    N, Tk = 400, 128
    dims = dict(n_speakers=1, n_speaker_dim=128, n_text=185, n_text_dim=512,
                n_mel_channels=80, n_hidden=1024, n_attn_channels=640,
                n_lstm_layers=2, mel_encoder_n_hidden=512)
    params, cfg = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                use_gate_layer=True, **dims)
    p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    for B in batches:
        rng = np.random.default_rng(0)
        residual = jnp.asarray(
            (rng.standard_normal((B, 80, N)) * 0.5).astype(np.float32)
        ).astype(jnp.bfloat16)
        text = jnp.asarray(rng.integers(1, 185, (B, Tk)))
        sids = jnp.zeros((B,), jnp.int32)

        for fused in (False, True):
            f = jax.jit(lambda p, r, s, t, _fu=fused: flowtron_infer(
                p, cfg, r, s, t, gate_threshold=1e6, fused=_fu)[0])
            try:
                float(jnp.sum(f(p16, residual, sids, text)
                              ).astype(jnp.float32))
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(jnp.sum(f(p16, residual, sids, text)
                                  ).astype(jnp.float32))
                    ts.append(time.perf_counter() - t0)
                label = "fused" if fused else "scan "
                print(f"B={B:4d} {label}: {min(ts)*1e3:8.1f} ms "
                      f"({B*N/min(ts)/1e3:7.1f}k frames/s, "
                      f"RTF {min(ts)/(N*256/22050):.4f} batch-wallclock)",
                      flush=True)
            except Exception as e:
                print(f"B={B:4d} fused={fused}: FAIL "
                      f"{str(e).splitlines()[0][:100]}", flush=True)


if __name__ == "__main__":
    main()
