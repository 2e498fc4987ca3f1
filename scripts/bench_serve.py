"""Serving-engine load test on the real TPU (flagship dims).

Starts a SynthesisEngine in-process (random flagship weights + flagship
WaveGlow, bf16), fires concurrent requests, and reports throughput and
latency percentiles — the numbers a deployment actually sees, including
micro-batching and the HTTP-layer frontend work (text cleaning) but not
network. The dev tunnel adds ~27 ms per device dispatch.

Usage: python scripts/bench_serve.py [n_requests] [concurrency]
  env SERVE_MAX_BATCH / SERVE_QUANTIZE / SERVE_DENOISE tweak the engine;
  SERVE_STREAM=pool:N | mux:N load-tests engine.stream() instead of
  submit() (N warm streamer pairs vs one N-slot batched multiplexer)
  and reports streams/s + TTFA percentiles.

`build_flagship_engine` / `run_load` are imported by the repo-root
bench.py so the driver's BENCH artifact records serving throughput with
the same methodology (warm pass after a cold compile pass).
"""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TEXTS = [
    "The quick brown fox jumps over the lazy dog by the river.",
    "Speech synthesis on tensor processing units is very fast.",
    "A different sentence keeps the text frontend honest here.",
    "Numbers like 42 and dates like March 3rd normalize too.",
]


def build_flagship_engine(max_batch=8, n_frames=400, batch_timeout_ms=30,
                          bf16=True, quantize="", **engine_kwargs):
    """Flagship-dims SynthesisEngine on random weights, bf16, gate biased
    hard negative so every request carries the full n_frames of work —
    the worst case a deployment pays."""
    import jax
    import jax.numpy as jnp
    import pickle
    import tempfile
    from scipy.io import wavfile
    from flowtron_tpu.models import flowtron_init
    from flowtron_tpu.train.checkpoints import save_checkpoint
    from flowtron_tpu.train.radam import radam
    from flowtron_tpu.vocoder import waveglow_init
    from flowtron_tpu.config import load_config
    from flowtron_tpu.serve import SynthesisEngine

    root = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    wavfile.write(os.path.join(root, "u.wav"), 22050,
                  (rng.standard_normal(4096) * 2000).astype(np.int16))
    with open(os.path.join(root, "fl.txt"), "w") as f:
        f.write(f"{root}/u.wav|hello|0\n")

    dims = dict(n_speakers=1, n_speaker_dim=128, n_text=185, n_text_dim=512,
                n_mel_channels=80, n_hidden=1024, n_attn_channels=640,
                n_lstm_layers=2, mel_encoder_n_hidden=512)
    params, _ = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                              use_gate_layer=True, **dims)
    # random weights fire the gate at frame ~1 (sigmoid(0) vs 0.5)
    params["flows"][-1]["gate_layer"]["b"] = jnp.asarray([-50.0])
    ckpt = os.path.join(root, "model")
    save_checkpoint(ckpt, params, radam(1e-3).init(params), 0, 1e-3)
    wgp, wgc = waveglow_init(jax.random.PRNGKey(1))
    wg_path = os.path.join(root, "wg.pkl")
    with open(wg_path, "wb") as f:
        pickle.dump({"params": wgp, "config": wgc}, f)

    config = load_config(overrides=[
        f"data_config.training_files={root}/fl.txt",
        f"data_config.validation_files={root}/fl.txt",
        "data_config.use_attn_prior=False",
    ])
    config["model_config"] = dict(dims, n_flows=2, use_gate_layer=True)

    engine = SynthesisEngine(config, ckpt, waveglow_path=wg_path,
                             max_batch=max_batch,
                             batch_timeout_ms=batch_timeout_ms,
                             text_buckets=(64,), n_frames=n_frames,
                             bf16=bf16, quantize=quantize,
                             **engine_kwargs)
    # round-3 hardening rejects text past the largest bucket (no more
    # silent truncation) — fail fast if a benchmark text would 413
    for t in TEXTS:
        n = len(engine.frontend.get_text(t))
        assert n <= max(engine.text_buckets), (t, n)
    return engine


def run_load(engine, n_requests, concurrency, texts=TEXTS,
             n_frames=None):
    """One load pass; returns {req_per_s, x_realtime, p50_ms, p90_ms,
    p99_ms, max_ms, wall_s, audio_s}."""
    lat = []
    lock = threading.Lock()
    it = iter(range(n_requests))

    def worker():
        while True:
            with lock:
                i = next(it, None)
            if i is None:
                return
            t0 = time.perf_counter()
            wav, _ = engine.submit(texts[i % len(texts)], 0, seed=i,
                                   n_frames=n_frames)
            dt = time.perf_counter() - t0
            with lock:
                lat.append((dt, len(wav) / 22050.0))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    ls = sorted(d for d, _ in lat)
    audio_s = sum(a for _, a in lat)
    return {
        "req_per_s": round(n_requests / wall, 2),
        "x_realtime": round(audio_s / wall, 1),
        "p50_ms": round(ls[len(ls) // 2] * 1e3),
        "p90_ms": round(ls[int(len(ls) * 0.9)] * 1e3),
        "p99_ms": round(ls[min(len(ls) - 1, int(len(ls) * 0.99))] * 1e3),
        "max_ms": round(ls[-1] * 1e3),
        "wall_s": round(wall, 1),
        "audio_s": round(audio_s, 1),
        "n_requests": n_requests,
        "concurrency": concurrency,
    }


def run_stream_load(engine, n_requests, concurrency, texts=TEXTS):
    """Streaming load pass: each worker opens engine.stream() and
    drains it, timing TTFA (first PCM chunk) and total stream wall.
    Overload (429) is retried — a fixed-slot streamer (pool or mux)
    under full load is EXPECTED to push back; retries measure the
    end-user experience of that."""
    from flowtron_tpu.serve import EngineOverloaded
    lat, errors = [], []
    lock = threading.Lock()
    it = iter(range(n_requests))

    def worker():
        while True:
            with lock:
                i = next(it, None)
            if i is None:
                return
            try:
                t0 = time.perf_counter()
                while True:
                    try:
                        gen = engine.stream(texts[i % len(texts)], 0,
                                            seed=i)
                        break
                    except EngineOverloaded:
                        time.sleep(0.05)
                ttfa, n_samples = None, 0
                for chunk in gen:
                    if ttfa is None and len(chunk):
                        ttfa = time.perf_counter() - t0
                    n_samples += len(chunk)
                dt = time.perf_counter() - t0
                with lock:
                    lat.append((ttfa if ttfa is not None else dt, dt,
                                n_samples / 22050.0))
            except Exception as e:   # surface, don't silently die
                with lock:
                    errors.append(repr(e))
                return

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise RuntimeError(f"{len(errors)} stream workers failed: "
                           f"{errors[:3]}")

    ttfas = sorted(f for f, _, _ in lat)
    audio_s = sum(a for _, _, a in lat)
    return {
        "streams_per_s": round(n_requests / wall, 2),
        "x_realtime": round(audio_s / wall, 1),
        "ttfa_p50_ms": round(ttfas[len(ttfas) // 2] * 1e3),
        "ttfa_p99_ms": round(
            ttfas[min(len(ttfas) - 1, int(len(ttfas) * 0.99))] * 1e3),
        "stream_wall_p50_ms": round(
            sorted(d for _, d, _ in lat)[len(lat) // 2] * 1e3),
        "wall_s": round(wall, 1),
        "audio_s": round(audio_s, 1),
        "n_requests": n_requests,
        "concurrency": concurrency,
    }


def main():
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_requests = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    concurrency = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    max_batch = int(os.environ.get("SERVE_MAX_BATCH", "8"))
    quantize = os.environ.get("SERVE_QUANTIZE", "")
    denoise = float(os.environ.get("SERVE_DENOISE", "0"))
    stream = os.environ.get("SERVE_STREAM", "")   # "pool:4" | "mux:8"

    if stream:
        kind, _, n = stream.partition(":")
        n = int(n or 4)
        kw = ({"stream_mux": n} if kind == "mux"
              else {"stream_workers": n})
        engine = build_flagship_engine(max_batch=max_batch,
                                       quantize=quantize,
                                       denoise=denoise, **kw)
        for label in ("cold(compiles)", "warm"):
            r = run_stream_load(engine, n_requests, concurrency)
            print(f"[{label}] STREAM {kind} n={n}: "
                  f"{r['streams_per_s']} streams/s, "
                  f"{r['x_realtime']}x realtime aggregate, "
                  f"TTFA p50 {r['ttfa_p50_ms']} / p99 "
                  f"{r['ttfa_p99_ms']} ms, stream wall p50 "
                  f"{r['stream_wall_p50_ms']} ms "
                  f"({r['audio_s']}s audio in {r['wall_s']}s)",
                  flush=True)
        engine.shutdown()
        return

    engine = build_flagship_engine(max_batch=max_batch, quantize=quantize,
                                   denoise=denoise)

    for label in ("cold(compiles)", "warm"):
        r = run_load(engine, n_requests, concurrency)
        print(f"[{label}] {r['n_requests']} reqs @ concurrency "
              f"{r['concurrency']} (max_batch {max_batch}"
              f"{', ' + quantize if quantize else ''}"
              f"{f', denoise {denoise}' if denoise else ''}): "
              f"{r['req_per_s']} req/s, {r['x_realtime']}x realtime "
              f"aggregate ({r['audio_s']}s audio in {r['wall_s']}s)")
        print(f"[{label}] latency p50 {r['p50_ms']} ms, "
              f"p90 {r['p90_ms']} ms, p99 {r['p99_ms']} ms, "
              f"max {r['max_ms']} ms", flush=True)


if __name__ == "__main__":
    main()
