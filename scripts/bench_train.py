"""Training-step throughput on the real TPU (flagship dims, synthetic
batch). Sweeps batch size with/without scan-level remat; reports
ms/step and mel frames/s/chip.

Usage: python scripts/bench_train.py [B ...]   (default: 32 64)
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
    from flowtron_tpu.models import flowtron_init
    from flowtron_tpu.train.loop import make_train_step
    from flowtron_tpu.train.radam import radam, masked_optimizer
    from flowtron_tpu.train.checkpoints import trainable_mask
    from flowtron_tpu.parallel.mesh import make_mesh

    T, Tk = 768, 128
    dims = dict(n_speakers=1, n_speaker_dim=128, n_text=185, n_text_dim=512,
                n_mel_channels=80, n_hidden=1024, n_attn_channels=640,
                n_lstm_layers=2, mel_encoder_n_hidden=512)
    params, cfg = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                use_gate_layer=True, **dims)
    mesh = make_mesh()
    optimizer = masked_optimizer(radam(1e-4, weight_decay=1e-6),
                                 trainable_mask(params, ()))
    opt_state = jax.jit(optimizer.init)(params)

    batches = [int(a) for a in sys.argv[1:]] or [32, 64]
    for B in batches:
        for remat in (True, False) if B >= 32 else (False,):
            tc = {"sigma": 1.0, "fp16_run": True, "use_ctc_loss": True,
                  "remat": remat}
            step = make_train_step(cfg, mesh, optimizer, tc)
            rng = np.random.default_rng(0)
            batch = {
                "mel": jnp.asarray(rng.standard_normal((B, 80, T))
                                   .astype(np.float32)),
                "speaker_ids": jnp.zeros((B,), jnp.int32),
                "text": jnp.asarray(rng.integers(1, 185, (B, Tk))),
                "in_lens": jnp.full((B,), Tk, jnp.int32),
                "out_lens": jnp.full((B,), T, jnp.int32),
                "gate_target": jnp.zeros((B, T), jnp.float32),
            }
            key = jax.random.PRNGKey(0)
            try:
                # deep-copy: the step donates its params/opt_state buffers
                p = jax.tree.map(jnp.copy, params)
                o = jax.tree.map(
                    lambda x: jnp.copy(x) if hasattr(x, "dtype") else x,
                    opt_state)
                p, o, m = step(p, o, batch, key, 0.01, 1.0)  # compile
                float(m["loss"])
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    p, o, m = step(p, o, batch, key, 0.01, 1.0)
                    float(m["loss"])
                    times.append(time.perf_counter() - t0)
                dt = min(times)
                print(f"B={B:3d} remat={int(remat)}: {dt*1e3:7.1f} ms/step "
                      f"= {B*T/dt/1e3:6.1f}k frames/s  "
                      f"(loss {float(m['loss']):.3f})", flush=True)
            except Exception as e:
                print(f"B={B:3d} remat={int(remat)}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
