"""Server CLI: argument parsing, engine construction (incl. extra
--model voices and the runtime loader), warmup, and graceful shutdown.
Run: python -m flowtron_tpu.serve ... (see the package docstring)."""

import argparse
import threading

from flowtron_tpu.serve.engine import SynthesisEngine
from flowtron_tpu.serve.http import make_handler

def main(argv=None):
    parser = argparse.ArgumentParser(description="Flowtron-TPU TTS server")
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-p", "--params", nargs="+", default=[])
    parser.add_argument("-f", "--flowtron_path", required=True)
    parser.add_argument("-w", "--waveglow_path", default="")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument("--batch-timeout-ms", type=float, default=20.0)
    parser.add_argument("--n-frames", type=int, default=400)
    parser.add_argument("--max-queue", type=int, default=64,
                        help="pending-request bound; overload returns 429")
    parser.add_argument("--stream-workers", type=int, default=2,
                        help="concurrent /stream(-ws) capacity (warm "
                             "streamer pairs; extra pairs reuse the "
                             "persistent compile cache)")
    parser.add_argument("--stream-mux", type=int, default=0,
                        help="N>0: serve streams through ONE batched "
                             "N-slot multiplexer (one chunk dispatch "
                             "advances all concurrent streams) instead "
                             "of the per-stream worker pool")
    parser.add_argument("--mux-joins-per-tick", type=int, default=0,
                        help="K>0: staggered join admission for "
                             "--stream-mux — at most K new streams "
                             "commit their (encode+prelude) device work "
                             "per tick, so a rush of joins cannot stall "
                             "running streams' chunk cadence; 0 joins "
                             "synchronously in the request thread "
                             "(measured: K=2 bounds the worst-case tick "
                             "stall under join churn but roughly doubles "
                             "cold rush-all TTFA — keep 0 unless high-"
                             "occupancy steady serving; see ROADMAP.md)")
    parser.add_argument("--int8", action="store_true",
                        help="int8 weight-only flows (alias: --quantize w8)")
    parser.add_argument("--quantize", choices=("w8", "w8a8", "w4"),
                        default="", help="flow-weight quantization mode")
    parser.add_argument("--fused", action="store_true",
                        help="VMEM-resident fused decoder kernel (best for "
                             "small max-batch / latency-sensitive serving)")
    parser.add_argument("--mesh", default="",
                        help="multi-chip serving mesh 'data,model', e.g. "
                             "'2,4': weights tensor-parallel over model, "
                             "requests sharded over data")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 weights/activations (the TPU "
                             "serving dtype; ~+30%% over fp32)")
    parser.add_argument("--replicas", default="1",
                        help="N or 'auto': data-parallel replicas, one "
                             "independent copy of the model per local "
                             "device, round-robin micro-batches. The "
                             "per-chip scale-out mode (throughput "
                             "saturates at max-batch 8 per chip); "
                             "incompatible with --mesh")
    parser.add_argument("--compile-cache", default="",
                        help="persistent XLA compile-cache dir (pairs "
                             "with --warmup: restarts reuse every "
                             "bucket program instead of recompiling)")
    parser.add_argument("-d", "--denoise", type=float, default=0.0,
                        help="WaveGlow bias-denoiser strength (0 = off; "
                             "needs -w). Batch path: on device inside "
                             "the jitted chain; streams: host-side "
                             "overlap-exact chunked subtraction. "
                             "Requests override with \"denoise\": S")
    parser.add_argument("--profiler-port", type=int, default=0,
                        help="start jax.profiler.start_server here so "
                             "TensorBoard's profile plugin can capture "
                             "on demand; POST /profile captures "
                             "server-side without it")
    parser.add_argument("--vocode-buckets", default="",
                        help="comma list of mel-frame buckets (e.g. "
                             "'100,200') enabling gate/length-aware "
                             "two-stage vocoding: the vocoder runs at "
                             "the smallest bucket covering the batch's "
                             "gated lengths instead of always "
                             "--n-frames (the vocoder is ~85%% of the "
                             "dispatch). Not supported with --mesh")
    parser.add_argument("--warmup", action="store_true",
                        help="pre-compile every (batch, text) bucket "
                             "program before accepting traffic (first-"
                             "request latency; composes with the "
                             "persistent compile cache)")
    parser.add_argument("--model", action="append", default=[],
                        metavar="NAME=CONFIG:CKPT[:VOCODER]",
                        help="load an EXTRA named model next to the "
                             "primary one (repeatable); requests pick a "
                             "voice with a \"model\" field, GET /models "
                             "lists them. The primary -c/-f model is "
                             "named 'default'. Quantize (--int8/"
                             "--quantize w8) to fit several models "
                             "resident at once.")
    args = parser.parse_args(argv)

    from flowtron_tpu.cli import _apply_platform_override
    _apply_platform_override()
    from flowtron_tpu.config import load_config

    if args.compile_cache:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)

    if args.replicas == "auto":
        import jax
        n_replicas = len(jax.local_devices())
    else:
        n_replicas = int(args.replicas)

    def build(config_path, ckpt, vocoder):
        return SynthesisEngine(
            load_config(config_path, args.params), ckpt, vocoder,
            max_batch=args.max_batch,
            batch_timeout_ms=args.batch_timeout_ms,
            n_frames=args.n_frames, int8=args.int8,
            quantize=args.quantize, fused=args.fused,
            mesh_shape=[int(x) for x in args.mesh.split(",")]
            if args.mesh else None, bf16=args.bf16,
            max_queue=args.max_queue,
            stream_workers=args.stream_workers,
            stream_mux=args.stream_mux,
            mux_joins_per_tick=args.mux_joins_per_tick,
            replicas=n_replicas,
            vocode_buckets=[int(x) for x in
                            args.vocode_buckets.split(",")]
            if args.vocode_buckets else None,
            denoise=args.denoise)

    engines = {"default": build(args.config, args.flowtron_path,
                                args.waveglow_path)}
    for spec in args.model:
        name, _, rest = spec.partition("=")
        parts = rest.split(":")
        if not name or len(parts) < 2:
            parser.error(f"--model expects NAME=CONFIG:CKPT[:VOCODER], "
                         f"got {spec!r}")
        engines[name] = build(parts[0], parts[1],
                              parts[2] if len(parts) > 2 else "")

    if args.profiler_port:
        import jax
        jax.profiler.start_server(args.profiler_port)
        print(f"jax profiler server on :{args.profiler_port}")

    if args.warmup:
        for name, eng in engines.items():
            print(f"warming up {name}...", flush=True)
            print(f"  {eng.warmup()}")

    from http.server import ThreadingHTTPServer
    server = ThreadingHTTPServer(("0.0.0.0", args.port),
                                 make_handler(engines, loader=build))

    import signal

    def _graceful(signum, frame):
        # serve_forever() blocks this (main) thread; shutdown() must be
        # called from another thread or it deadlocks
        print(f"signal {signum}: draining...", flush=True)
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _graceful)
    signal.signal(signal.SIGINT, _graceful)

    print(f"serving on :{args.port} (max_batch={args.max_batch}, "
          f"models={list(engines)})")
    server.serve_forever()
    # SIGTERM/SIGINT path. ThreadingHTTPServer handler threads are
    # daemonic and may still be running — snapshot the dict (a late
    # POST /models could still mutate it) and drain every engine;
    # shutdown() waits for dispatched work before dropping memory.
    for eng in list(engines.values()):
        eng.shutdown()
    print("shutdown complete")
