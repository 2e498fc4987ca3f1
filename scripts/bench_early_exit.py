"""Measure fused early-exit: wallclock vs where the gate fires.
Sets the gate bias so the gate fires at frame ~1 (max skip), never
(no skip), and compares with the non-early fused path.
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

    B, N, Tk = 1, 400, 128
    dims = dict(n_speakers=1, n_speaker_dim=128, n_text=185, n_text_dim=512,
                n_mel_channels=80, n_hidden=1024, n_attn_channels=640,
                n_lstm_layers=2, mel_encoder_n_hidden=512)
    params, cfg = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                use_gate_layer=True, **dims)

    rng = np.random.default_rng(0)
    residual = jnp.asarray(
        (rng.standard_normal((B, 80, N)) * 0.5).astype(np.float32)
    ).astype(jnp.bfloat16)
    text = jnp.asarray(rng.integers(1, 185, (B, Tk)))
    sids = jnp.zeros((B,), jnp.int32)

    def bench(name, gate_bias, fused):
        p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        p["flows"][-1]["gate_layer"]["b"] = jnp.asarray(
            [gate_bias], jnp.bfloat16)
        f = jax.jit(lambda pp, r, s, t: flowtron_infer(
            pp, cfg, r, s, t, gate_threshold=0.5, fused=fused))
        mel, _, nv = f(p, residual, sids, text)
        nv = int(np.asarray(nv)[0])
        float(jnp.sum(mel).astype(jnp.float32))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(p, residual, sids, text)
            float(jnp.sum(out[0]).astype(jnp.float32))
            ts.append(time.perf_counter() - t0)
        print(f"{name:34s}: {min(ts)*1e3:7.1f} ms (n_valid={nv})",
              flush=True)

    bench("fused, gate never fires", -50.0, True)
    bench("early, gate never fires", -50.0, "early")
    bench("early, gate fires @ frame 1", 5.0, "early")


if __name__ == "__main__":
    main()
