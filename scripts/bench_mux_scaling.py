"""Mux scaling + join-churn fairness at N = 16 / 24 / 32 (real TPU).

Extends scripts/bench_multistream.py (which compares mux vs pool at
N<=16) with the large-slot regime and the two load patterns round 4
left unquantified (ROADMAP "mux join latency grows superlinearly"):

  rush : all N streams open() at t0 (the worst case: every join's
         encode(+prelude) dispatch and the first ticks contend).
         Reports per-stream TTFA p50/p90/max, steady tick cadence,
         per-stream RTF, and aggregate RTF.
  churn: a fresh stream joins every tick while ~N/2 short utterances
         are always live (steady arrival, the serving regime).
         Reports joiner TTFA and the tick cadence established streams
         experience while joins keep landing.

--admit K runs the same loads with max_joins_per_tick=K (staggered
join admission, infer/multistream.py) for the re-measure half of the
round-5 ask. The reference has no streaming or serving at all
(reference:inference.py:40-132); this characterizes beyond-reference
capacity.

Usage: python scripts/bench_mux_scaling.py [N ...] [--admit K]
       (default Ns: 16 24 32)
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
CHUNK = 40


def build_models():
    from flowtron_tpu.models import flowtron_init
    from flowtron_tpu.vocoder import waveglow_init

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

    return to_bf16(params), cfg, to_bf16(wgp), wgc


def make_mux(params, cfg, wgp, wgc, N, n_frames, admit):
    from flowtron_tpu.infer.multistream import MultiStreamTTS
    return MultiStreamTTS(params, cfg, wgp, wgc, slots=N,
                          chunk_frames=CHUNK, text_len=128,
                          max_frames=n_frames, gate_threshold=1e6,
                          max_joins_per_tick=admit)


def rush(params, cfg, wgp, wgc, N, admit, n_frames=400, reps=2):
    rng = np.random.default_rng(0)
    texts = [rng.integers(1, 185, (128,)) for _ in range(N)]
    audio_s = n_frames * HOP / SR
    for rep in range(reps):            # rep 0 warms the compile cache
        mux = make_mux(params, cfg, wgp, wgc, N, n_frames, admit)
        t0 = time.perf_counter()
        handles = [mux.open(jax.random.PRNGKey(100 + i), 0, texts[i])
                   for i in range(N)]
        open_done = time.perf_counter() - t0
        first = {}
        tick_times = []
        while mux.active:
            tt0 = time.perf_counter()
            evs = mux.step()
            now = time.perf_counter()
            tick_times.append(now - tt0)
            for h, a, _d in evs:
                if a.size and h not in first:
                    first[h] = now - t0
        wall = time.perf_counter() - t0
    ttfa = np.array([first[h] for h in handles]) * 1e3
    cad = np.array(tick_times[1:-1]) * 1e3 if len(tick_times) > 2 \
        else np.array(tick_times) * 1e3
    print(f"N={N:3d} admit={admit or 'sync':>4} rush: "
          f"open_all {open_done * 1e3:6.1f} ms  "
          f"ttfa p50 {np.percentile(ttfa, 50):6.1f} "
          f"p90 {np.percentile(ttfa, 90):6.1f} "
          f"max {ttfa.max():6.1f} ms  "
          f"tick p50 {np.percentile(cad, 50):5.1f} "
          f"p90 {np.percentile(cad, 90):5.1f} ms  "
          f"agg_rtf {wall / (N * audio_s):.4f}  "
          f"stream_rtf {wall / audio_s:.3f}", flush=True)


def churn(params, cfg, wgp, wgc, N, admit, n_frames=200, joins=40):
    """Hold ~N/2 live short streams; add one joiner per tick."""
    rng = np.random.default_rng(1)
    mux = make_mux(params, cfg, wgp, wgc, N, n_frames, admit)
    open_t, first = {}, {}
    nxt = 0

    def join_one():
        nonlocal nxt
        ids = rng.integers(1, 185, (64 + (nxt % 5) * 8,))
        h = mux.open(jax.random.PRNGKey(1000 + nxt), 0, ids)
        open_t[h] = time.perf_counter()
        nxt += 1
        return h

    for _ in range(N // 2):            # pre-fill to half occupancy
        join_one()
    warm = 0
    while warm < 3:                    # warm ticks (compile covered by
        mux.step()                     # the rush run; settle cadence)
        warm += 1
    tick_times = []
    while nxt < joins or mux.active:
        if nxt < joins and mux.active < N:
            join_one()
        tt0 = time.perf_counter()
        evs = mux.step()
        now = time.perf_counter()
        tick_times.append(now - tt0)
        for h, a, _d in evs:
            if a.size and h not in first:
                first[h] = now - open_t[h]
    ttfa = np.array([first[h] - 0.0 for h in first
                     if h in open_t]) * 1e3
    cad = np.array(tick_times) * 1e3
    print(f"N={N:3d} admit={admit or 'sync':>4} churn: "
          f"joiner ttfa p50 {np.percentile(ttfa, 50):6.1f} "
          f"p90 {np.percentile(ttfa, 90):6.1f} ms  "
          f"tick p50 {np.percentile(cad, 50):5.1f} "
          f"p90 {np.percentile(cad, 90):5.1f} "
          f"max {cad.max():6.1f} ms  "
          f"({len(first)} streams)", flush=True)


def main():
    args = sys.argv[1:]
    admit = None
    if "--admit" in args:
        i = args.index("--admit")
        admit = int(args[i + 1])
        del args[i:i + 2]
    ns = [int(a) for a in args] or [16, 24, 32]
    params, cfg, wgp, wgc = build_models()
    for N in ns:
        rush(params, cfg, wgp, wgc, N, admit)
        churn(params, cfg, wgp, wgc, N, admit)


if __name__ == "__main__":
    main()
