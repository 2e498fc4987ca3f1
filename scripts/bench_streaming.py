"""Measure streaming TTS latency on the real TPU (flagship dims).

Reports time-to-first-audio (TTFA) and steady-state chunk cadence for
the streaming path (1-flow model + WaveGlow), vs the offline
whole-utterance baseline. Note the dev tunnel adds ~27 ms fixed
dispatch cost per jitted call; production on-host serving would see
lower absolute numbers with the same structure.
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
    from flowtron_tpu.vocoder import waveglow_init, waveglow_infer
    from flowtron_tpu.infer.streaming import stream_tts

    dims = dict(n_speakers=1, n_speaker_dim=128, n_text=185, n_text_dim=512,
                n_mel_channels=80, n_hidden=1024, n_attn_channels=640,
                n_lstm_layers=2, mel_encoder_n_hidden=512)
    params, cfg = flowtron_init(jax.random.PRNGKey(0), n_flows=1,
                                use_gate_layer=True, **dims)
    wgp, wgc = waveglow_init(jax.random.PRNGKey(1))

    to_bf16 = lambda t: jax.tree.map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    params, wgp = to_bf16(params), to_bf16(wgp)

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 185, (1, 128)))
    sids = jnp.zeros((1,), jnp.int32)
    N = 400

    # warm streamer pair, as the serving engine holds them
    # (stream_tts builds fresh instances = fresh jit caches; fine for a
    # one-shot CLI, wrong for a latency benchmark)
    from flowtron_tpu.infer.streaming import (
        StreamingMelSynthesizer, StreamingVocoder, pump_stream)
    mel_s = StreamingMelSynthesizer(params, cfg, chunk_frames=40,
                                    gate_threshold=1e6, max_frames=N)
    voc = StreamingVocoder(wgp, wgc, jax.random.PRNGKey(4), sigma=0.8,
                           context=24, lookahead=16, dtype=jnp.bfloat16)

    def run_stream():
        ts, t0, total = [], time.perf_counter(), 0
        voc.reset(jax.random.PRNGKey(4))
        for audio in pump_stream(mel_s, voc, jax.random.PRNGKey(3),
                                 sids, text):
            ts.append(time.perf_counter() - t0)
            total += audio.shape[1]
        return ts, total

    # warm (compile every window shape)
    run_stream()
    ts, total = run_stream()
    audio_s = total / 22050.0
    print(f"stream: TTFA {ts[0]*1e3:7.1f} ms, chunks at "
          f"{', '.join(f'{t*1e3:.0f}' for t in ts[:6])}... ms; "
          f"{len(ts)} chunks, {audio_s:.2f}s audio, "
          f"last-at {ts[-1]*1e3:.0f} ms (agg RTF {ts[-1]/audio_s:.4f})")

    # flagship 2-flow topology (round 3): two-stage streaming — the
    # gated back flow runs as a one-dispatch offline prelude, then the
    # forward flow streams with carried state. TTFA = prelude + first
    # chunk + vocoder lookahead.
    params2, cfg2 = flowtron_init(jax.random.PRNGKey(5), n_flows=2,
                                  use_gate_layer=True, **dims)
    params2 = to_bf16(params2)
    mel_s2 = StreamingMelSynthesizer(params2, cfg2, chunk_frames=40,
                                     gate_threshold=1e6, max_frames=N)

    def run_stream2():
        ts, t0, total = [], time.perf_counter(), 0
        voc.reset(jax.random.PRNGKey(4))
        for audio in pump_stream(mel_s2, voc, jax.random.PRNGKey(3),
                                 sids, text):
            ts.append(time.perf_counter() - t0)
            total += audio.shape[1]
        return ts, total

    run_stream2()
    ts2, total2 = run_stream2()
    audio_s2 = total2 / 22050.0
    print(f"stream 2-flow (flagship): TTFA {ts2[0]*1e3:7.1f} ms, chunks "
          f"at {', '.join(f'{t*1e3:.0f}' for t in ts2[:6])}... ms; "
          f"{len(ts2)} chunks, {audio_s2:.2f}s audio, "
          f"last-at {ts2[-1]*1e3:.0f} ms (agg RTF {ts2[-1]/audio_s2:.4f})")

    # offline baseline: full mel then full vocoder (same shapes)
    residual = jnp.asarray(
        (rng.standard_normal((1, 80, N)) * 0.5).astype(np.float32)
    ).astype(jnp.bfloat16)

    @jax.jit
    def offline(p, wp, r, s, t):
        mel, _, nv = flowtron_infer(p, cfg, r, s, t, gate_threshold=1e6)
        return waveglow_infer(wp, wgc, mel, sigma=0.8,
                              key=jax.random.PRNGKey(0))

    a = offline(params, wgp, residual, sids, text)
    float(jnp.sum(a).astype(jnp.float32))
    t0 = time.perf_counter()
    a = offline(params, wgp, residual, sids, text)
    float(jnp.sum(a).astype(jnp.float32))
    dt = time.perf_counter() - t0
    print(f"offline: first-and-only audio at {dt*1e3:7.1f} ms "
          f"({N*256/22050:.2f}s audio, RTF {dt/(N*256/22050):.4f})")


if __name__ == "__main__":
    main()
