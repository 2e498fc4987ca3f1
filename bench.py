"""Benchmark: AR mel-synthesis throughput on the flagship (LJS 2-flow,
1024-hidden) model — the BASELINE.json north-star metric — plus the
end-to-end RTF (AR mel -> WaveGlow vocoder -> waveform, gate enabled),
the BASELINE.json *primary* metric.

Prints ONE JSON line:
  {"metric": "mel_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 2870, "e2e_rtf": R, ...}

Baseline anchor: RTF 0.03 on a v5e chip = 22050/256/0.03 ~= 2870 frames/s
(see BASELINE.md). Runs on whatever the default JAX backend is (the real
TPU under the driver; CPU if forced).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# A dead axon tunnel makes jax.devices() HANG (not error), which would
# stall the driver forever. Probe device init in a subprocess with a
# hard timeout and emit an honest one-line error artifact instead.
if os.environ.get("FLOWTRON_BENCH_PROBED") != "1":
    env = dict(os.environ, FLOWTRON_BENCH_PROBED="1")
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             # a real dispatch, not just enumeration: the tunnel has a
             # failure mode where jax.devices() returns but the data
             # plane hangs on the first computation
             "import jax, jax.numpy as jnp; d = jax.devices()[0]; "
             "print(d.platform, float(jnp.ones(8).sum()))"],
            # 300 s: device init right after another axon client exits
            # can take >180 s even on a healthy tunnel (observed r5)
            env=env, timeout=float(os.environ.get("BENCH_PROBE_TIMEOUT",
                                                  "300")),
            capture_output=True, text=True)
        probe_ok = out.returncode == 0
        probe_msg = (out.stdout + out.stderr).strip()[-200:]
    except subprocess.TimeoutExpired:
        probe_ok, probe_msg = False, "device init timed out (tunnel down?)"
    if not probe_ok:
        print(json.dumps({
            "metric": "mel_frames_per_sec_per_chip", "value": 0.0,
            "unit": "frames/s", "vs_baseline": 0.0,
            "error": f"TPU backend unavailable: {probe_msg}"}))
        sys.exit(1)

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

    # best measured serving point: int8 weights at B=128 (ROADMAP.md
    # batch-scaling study: throughput peaks at 128 and falls beyond)
    B2 = 128
    residual2 = jnp.asarray(
        (rng.standard_normal((B2, 80, N)) * 0.5).astype(np.float32))
    text2 = jnp.asarray(rng.integers(1, 185, (B2, Tk)))
    sids2 = jnp.zeros((B2,), jnp.int32)
    float(infer(qparams, residual2, sids2, text2))
    t0 = time.perf_counter()
    float(infer(qparams, residual2, sids2, text2))
    best_fps = K * B2 * N / (time.perf_counter() - t0)

    e2e_rtf, e2e_detail = bench_e2e(params, cfg)
    stream_detail = bench_stream(params, cfg)
    serving_detail = bench_serving()
    serving_mux16_detail = bench_serving_stream_mux(16)
    mux_detail = bench_mux(params, cfg)
    train_detail = bench_training(params, cfg)

    print(json.dumps({
        "metric": "mel_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 3),
        "e2e_rtf": e2e_rtf,
        "detail": {"batch": B, "n_frames": N, "chained_passes": K,
                   "seconds": round(dt, 4),
                   "backend": jax.default_backend(), "dtype": "fp32",
                   "rtf_batch_wallclock": round(dt / (K * N * 256 / 22050), 4),
                   "int8_weights_frames_per_sec": round(int8_fps, 1),
                   "best_serving_int8_b128_frames_per_sec":
                       round(best_fps, 1),
                   "best_serving_vs_baseline":
                       round(best_fps / BASELINE_FRAMES_PER_SEC, 1),
                   "e2e": e2e_detail,
                   "stream": stream_detail,
                   "serving": serving_detail,
                   "serving_stream_mux16": serving_mux16_detail,
                   "mux": mux_detail,
                   "train": train_detail},
    }))


def bench_e2e(params, cfg, N=400, K=2):
    """End-to-end RTF: text+latents -> AR mel (gate ENABLED, threshold 0.5,
    the reference's default op point) -> WaveGlow-style vocoder -> waveform.
    bf16 weights/activations (the TPU serving configuration; fp32 is the
    parity configuration, tested elsewhere).

    Reports the strict single-stream latency RTF (B=1: wallclock /
    audio seconds) as the headline e2e_rtf, plus B=8 batched-serving
    numbers (wallclock / per-stream audio seconds, and the aggregate
    per-stream RTF).
    """
    from flowtron_tpu.models import flowtron_infer
    from flowtron_tpu.vocoder import waveglow_init, waveglow_infer

    wg_params, wg_cfg = waveglow_init(jax.random.PRNGKey(1))

    def to_bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    p16, wg16 = to_bf16(params), to_bf16(wg_params)

    def measure(B, fused=False):
        rng = np.random.default_rng(1)
        residual = jnp.asarray(
            (rng.standard_normal((B, 80, N)) * 0.5).astype(np.float32)
        ).astype(jnp.bfloat16)
        text = jnp.asarray(rng.integers(1, 185, (B, 128)))
        sids = jnp.zeros((B,), jnp.int32)

        def run(p, wgp, r, s, t):
            total = jnp.zeros((), jnp.float32)
            for i in range(K):
                # gate enabled: early-exit semantics run on device
                mel, _, n_valid = flowtron_infer(p, cfg, r, s, t,
                                                 gate_threshold=0.5,
                                                 fused=fused)
                audio = waveglow_infer(wgp, wg_cfg, mel, sigma=0.8,
                                       key=jax.random.PRNGKey(i))
                total = (total + jnp.sum(audio).astype(jnp.float32)
                         + (0.0 if n_valid is None
                            else jnp.sum(n_valid).astype(jnp.float32)))
                r = 0.999 * r + 0.001 * mel  # chain passes (see above)
            return total

        e2e = jax.jit(run)
        float(e2e(p16, wg16, residual, sids, text))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(e2e(p16, wg16, residual, sids, text))
            times.append(time.perf_counter() - t0)
        return min(times) / (K * N * 256 / 22050)

    # single stream rides the fused VMEM-resident decoder kernel
    # (ops/decoder_pallas.py: 1.7x at B=1; the scan path wins at B>=8)
    rtf_b1 = measure(1, fused=True)
    rtf_b8 = measure(8)
    return round(rtf_b1, 4), {
        "n_frames": N, "chained_passes": K, "dtype": "bf16",
        "gate_threshold": 0.5, "b1_fused_kernel": True,
        "rtf_single_stream_b1": round(rtf_b1, 4),
        "rtf_batch_wallclock_b8": round(rtf_b8, 4),
        "rtf_per_stream_b8": round(rtf_b8 / 8, 4),
        "streams_x_realtime_b8": round(8 / rtf_b8, 1),
    }


def bench_stream(params, cfg, N=400):
    """Flagship 2-flow STREAMING time-to-first-audio (round 3): the
    gated back flow runs as a one-dispatch offline prelude (fused
    VMEM-resident kernel at B=1), then the forward flow streams with
    carried state into the sliding-window vocoder. Reports warm TTFA and
    chunk cadence — the serving engine's /stream latency shape."""
    from flowtron_tpu.vocoder import waveglow_init
    from flowtron_tpu.infer.streaming import (
        StreamingMelSynthesizer, StreamingVocoder, pump_stream)

    wg_params, wg_cfg = waveglow_init(jax.random.PRNGKey(1))

    def to_bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    p16, wg16 = to_bf16(params), to_bf16(wg_params)
    rng = np.random.default_rng(2)
    text = jnp.asarray(rng.integers(1, 185, (1, 128)))
    sids = jnp.zeros((1,), jnp.int32)

    fused = jax.default_backend() == "tpu" and "early"
    mel_s = StreamingMelSynthesizer(p16, cfg, chunk_frames=40,
                                    gate_threshold=1e6, max_frames=N,
                                    fused=fused)
    voc = StreamingVocoder(wg16, wg_cfg, jax.random.PRNGKey(4), sigma=0.8,
                           dtype=jnp.bfloat16)

    def run():
        ts, t0 = [], time.perf_counter()
        voc.reset(jax.random.PRNGKey(4))
        for _audio in pump_stream(mel_s, voc, jax.random.PRNGKey(3),
                                  sids, text):
            ts.append(time.perf_counter() - t0)
        return ts

    run()  # compile prelude/chunk/windows
    best = min((run() for _ in range(3)), key=lambda ts: ts[0])
    audio_s = N * 256 / 22050.0
    return {"topology": "2-flow two-stage", "dtype": "bf16",
            "ttfa_ms": round(best[0] * 1e3, 1),
            "chunk_cadence_ms": round(
                (best[-1] - best[0]) / max(1, len(best) - 1) * 1e3, 1),
            "n_chunks": len(best),
            "agg_rtf": round(best[-1] / audio_s, 4)}


def bench_mux(params, cfg, N=8, n_frames=400):
    """Batched multi-stream mux (round 4, serve --stream-mux): N
    concurrent streams through ONE fused tick dispatch + width-grouped
    vocoder windows, at the flagship 2-flow serving topology in bf16.
    Reports aggregate RTF, warm tick cadence and per-stream TTFA
    (open incl. the B=1 gated prelude + the first tick). Full study vs
    the per-stream pool: scripts/bench_multistream.py / ROADMAP
    (4.1x/6.3x/8.5x at N=4/8/16 on the 1-flow topology)."""
    from flowtron_tpu.vocoder import waveglow_init
    from flowtron_tpu.infer.multistream import MultiStreamTTS

    wg_params, wg_cfg = waveglow_init(jax.random.PRNGKey(1))

    def to_bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree)

    p16, wg16 = to_bf16(params), to_bf16(wg_params)
    rng = np.random.default_rng(5)
    texts = [rng.integers(1, 185, (128,)) for _ in range(N)]
    mux = MultiStreamTTS(p16, cfg, wg16, wg_cfg, slots=N,
                         chunk_frames=40, text_len=128,
                         max_frames=n_frames, gate_threshold=1e6)
    for rep in range(2):             # rep 0 warms the compile cache
        t0 = time.perf_counter()
        open_ts, last_open = [], t0
        for i in range(N):
            ts = time.perf_counter()
            mux.open(jax.random.PRNGKey(300 + i), 0, texts[i])
            open_ts.append(time.perf_counter() - ts)
            last_open = ts
        ticks, ttfa = [], None
        while mux.active:
            tt = time.perf_counter()
            evs = mux.step()
            ticks.append(time.perf_counter() - tt)
            if ttfa is None and any(a.size for _, a, _ in evs):
                ttfa = time.perf_counter()
        wall = time.perf_counter() - t0
    audio_s = n_frames * 256 / 22050.0
    cad = sorted(ticks[1:-1]) if len(ticks) > 2 else sorted(ticks)
    return {"slots": N, "topology": f"{cfg['n_flows']}-flow",
            "dtype": "bf16",
            "agg_rtf": round(wall / (N * audio_s), 4),
            "tick_p50_ms": round(cad[len(cad) // 2] * 1e3, 1),
            "open_ms": round(1e3 * sum(open_ts) / len(open_ts), 1),
            # a joining stream's marginal TTFA: its own open + the tick
            # that delivers its first chunk (the server's stepper ticks
            # between joins, so only the rush metric pays all N opens)
            "ttfa_ms": round((ttfa - last_open) * 1e3, 1),
            "ttfa_rush_all_ms": round((ttfa - t0) * 1e3, 1)}


def _load_bench_serve():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_serve", os.path.join(os.path.dirname(__file__),
                                    "scripts", "bench_serve.py"))
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)
    return bs


def bench_serving_stream_mux(N=16):
    """Streaming serve under load through the N-slot mux (round-5 mux
    scaling ask: the SERVE_STREAM=mux:16 load point of scripts/
    bench_serve.py as a driver-visible detail). Workers open
    engine.stream() and drain it; reports TTFA percentiles and
    aggregate realtime. TPU-only."""
    if jax.default_backend() != "tpu":
        return {"skipped": jax.default_backend()}
    bs = _load_bench_serve()
    engine = bs.build_flagship_engine(max_batch=8, stream_mux=N)
    try:
        bs.run_stream_load(engine, N, N)          # cold: compiles/warms
        warm = bs.run_stream_load(engine, 2 * N, N)
    finally:
        engine.shutdown()
    warm["mux_slots"] = N
    warm["note"] = ("warm pass; tunnel load-test variance is +-20% "
                    "run-to-run — see ROADMAP ranges")
    return warm


def bench_serving():
    """Serving-engine throughput under concurrent load (scripts/
    bench_serve.py methodology: flagship dims, bf16, full 400-frame
    utterances, cold compile pass then a warm measured pass). TPU-only —
    the flagship engine is not meaningful on one CPU core."""
    if jax.default_backend() != "tpu":
        return {"skipped": jax.default_backend()}
    bs = _load_bench_serve()
    engine = bs.build_flagship_engine(max_batch=8)
    try:
        bs.run_load(engine, 16, 16)  # cold: compiles / warms the chain
        warm = bs.run_load(engine, 48, 16)
    finally:
        engine.shutdown()
    warm["note"] = ("warm pass; tunnel load-test variance is +-20% "
                    "run-to-run — see ROADMAP ranges")
    return warm


def bench_training(params, cfg, B=128, T=768, Tk=128):
    """Training-step throughput (scripts/bench_train.py methodology):
    flagship dims, bf16 compute, scan-level remat, B=128/T=768 — the best
    measured production configuration (ROADMAP batch-scaling study:
    147.8k frames/s peak). TPU-only — the flagship step is not meaningful
    on one CPU core. Included so training-perf regressions are
    driver-visible across rounds (BENCH artifacts)."""
    if jax.default_backend() != "tpu":
        return {"skipped": jax.default_backend()}
    from flowtron_tpu.train.loop import make_train_step
    from flowtron_tpu.train.radam import radam, masked_optimizer
    from flowtron_tpu.train.checkpoints import trainable_mask
    from flowtron_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    optimizer = masked_optimizer(radam(1e-4, weight_decay=1e-6),
                                 trainable_mask(params, ()))
    tc = {"sigma": 1.0, "fp16_run": True, "use_ctc_loss": True,
          "remat": True}
    step = make_train_step(cfg, mesh, optimizer, tc)

    rng = np.random.default_rng(3)
    batch = {
        "mel": jnp.asarray(
            rng.standard_normal((B, 80, T)).astype(np.float32)),
        "speaker_ids": jnp.zeros((B,), jnp.int32),
        "text": jnp.asarray(rng.integers(1, 185, (B, Tk))),
        "in_lens": jnp.full((B,), Tk, jnp.int32),
        "out_lens": jnp.full((B,), T, jnp.int32),
        "gate_target": jnp.zeros((B, T), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    # deep-copy: the step donates its params/opt_state buffers, and the
    # caller's `params` is reused by other bench sections
    p = jax.tree.map(jnp.copy, params)
    o = jax.jit(optimizer.init)(p)
    o = jax.tree.map(lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, o)
    p, o, m = step(p, o, batch, key, 0.01, 1.0)  # compile + warm
    float(m["loss"])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        p, o, m = step(p, o, batch, key, 0.01, 1.0)
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    detail = {"batch": B, "n_frames": T, "dtype": "bf16", "remat": True,
              "ms_per_step": round(dt * 1e3, 1),
              "frames_per_sec": round(B * T / dt, 1),
              "loss": round(float(m["loss"]), 3)}

    # MFU + peak HBM, driver-visible across rounds (the ~25%-forward-MFU
    # attribution lives in ROADMAP.md; this keeps it measured). Model
    # FLOPs use the standard MFU convention — backward charged at 2x
    # forward, remat recompute NOT charged — so model_flops = 3x XLA's
    # own FLOP count of the forward/loss step at identical shapes.
    try:
        from flowtron_tpu.train.loop import make_eval_step
        ca = make_eval_step(cfg, mesh, tc).lower(p, batch).compile() \
            .cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fwd_flops = float(ca.get("flops", 0.0))
        V5E_PEAK_BF16 = 197e12  # per-chip bf16 FLOP/s
        if fwd_flops > 0:
            detail["mfu"] = round(3.0 * fwd_flops / (dt * V5E_PEAK_BF16),
                                  4)
    except Exception as e:
        detail["mfu_error"] = repr(e)
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        if ms.get("peak_bytes_in_use"):
            detail["peak_gb"] = round(ms["peak_bytes_in_use"] / 2 ** 30,
                                      2)
    except Exception as e:
        detail["peak_gb_error"] = repr(e)
    return detail


if __name__ == "__main__":
    main()
