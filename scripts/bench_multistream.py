"""Batched multi-stream mux vs N independent streamers (real TPU).

Measures, at flagship dims (1-flow streaming topology, bf16), for
N = 4 / 8 / 16 concurrent streams:
  - per-tick cadence of the mux (one batched chunk dispatch + grouped
    vocoder windows advancing ALL N streams)
  - the same N utterances synthesized by N independent B=1 streamer
    pairs round-robined on one device (the --stream-workers pool model:
    each stream pays its own dispatch chain)
  - aggregate RTF (total wall / total audio) for both

The mux's win comes from the measured B=1 physics (ROADMAP): the
decoder chunk step is weight-load-bound, so advancing 8 streams in one
dispatch costs about the same as advancing 1; the pool pays that cost
N times. The dev tunnel adds ~27 ms per dispatch, which ALSO multiplies
by N for the pool but not for the mux.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

HOP = 256
SR = 22050


def main():
    from flowtron_tpu.models import flowtron_init
    from flowtron_tpu.vocoder import waveglow_init
    from flowtron_tpu.infer.streaming import (
        StreamingMelSynthesizer, StreamingVocoder, pump_stream)
    from flowtron_tpu.infer.multistream import MultiStreamTTS

    dims = dict(n_speakers=1, n_speaker_dim=128, n_text=185,
                n_text_dim=512, n_mel_channels=80, n_hidden=1024,
                n_attn_channels=640, n_lstm_layers=2,
                mel_encoder_n_hidden=512)
    params, cfg = flowtron_init(jax.random.PRNGKey(0), n_flows=1,
                                use_gate_layer=True, **dims)
    wgp, wgc = waveglow_init(jax.random.PRNGKey(1))

    def to_bf16(t):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    params, wgp = to_bf16(params), to_bf16(wgp)

    rng = np.random.default_rng(0)
    N_FRAMES = 400          # ~4.6 s of audio per stream
    CHUNK = 40
    audio_s = N_FRAMES * HOP / SR

    for N in (4, 8, 16):
        texts = [rng.integers(1, 185, (128,)) for _ in range(N)]

        # ---- mux: one N-slot multiplexer ----
        mux = MultiStreamTTS(params, cfg, wgp, wgc, slots=N,
                             chunk_frames=CHUNK, text_len=128,
                             max_frames=N_FRAMES, gate_threshold=1e6)
        for rep in range(2):            # rep 0 warms the compile cache
            handles = [
                mux.open(jax.random.PRNGKey(100 + i), 0, texts[i])
                for i in range(N)]
            tick_times, t0 = [], time.perf_counter()
            ttfa = None
            while mux.active:
                tt0 = time.perf_counter()
                evs = mux.step()
                tick_times.append(time.perf_counter() - tt0)
                if ttfa is None and any(a.size for _, a, _ in evs):
                    ttfa = time.perf_counter() - t0
            wall = time.perf_counter() - t0
        cad = np.array(tick_times[1:-1]) * 1e3 if len(tick_times) > 2 \
            else np.array(tick_times) * 1e3
        print(f"N={N:3d} mux : wall {wall:6.2f}s  "
              f"agg_rtf {wall / (N * audio_s):.4f}  "
              f"tick p50 {np.percentile(cad, 50):6.1f} ms "
              f"p90 {np.percentile(cad, 90):6.1f} ms  "
              f"ttfa {ttfa * 1e3:6.1f} ms  ticks {len(tick_times)}")

        # ---- pool model: N independent B=1 streamer pairs, round-
        # robin interleaved chunk by chunk on the one device (the
        # fair single-device comparison: same interleaving, N
        # dispatch chains instead of 1) ----
        pairs = [
            (StreamingMelSynthesizer(params, cfg, chunk_frames=CHUNK,
                                     gate_threshold=1e6,
                                     max_frames=N_FRAMES),
             StreamingVocoder(wgp, wgc, jax.random.PRNGKey(200 + i),
                              sigma=0.8, dtype=jnp.bfloat16))
            for i in range(min(N, 4))]  # pool instances share jit
        #     caches through the persistent compile cache; 4 pairs
        #     suffice to model per-stream dispatch cost — each pair
        #     runs N/len(pairs) streams back to back
        for rep in range(2):
            t0 = time.perf_counter()
            per_pair = N // len(pairs)
            for p_i, (mel_s, voc) in enumerate(pairs):
                for j in range(per_pair):
                    i = p_i * per_pair + j
                    voc.reset(jax.random.PRNGKey(100 + i))
                    for _ in pump_stream(
                            mel_s, voc, jax.random.PRNGKey(100 + i),
                            jnp.zeros((1,), jnp.int32),
                            jnp.asarray(texts[i][None, :]),
                            sigma=0.5):
                        pass
            wall_pool = time.perf_counter() - t0
        print(f"N={N:3d} pool: wall {wall_pool:6.2f}s  "
              f"agg_rtf {wall_pool / (N * audio_s):.4f}  "
              f"speedup {wall_pool / wall:4.1f}x")


if __name__ == "__main__":
    main()
