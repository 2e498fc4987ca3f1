"""Measure gate/length-aware two-stage vocoding on the real TPU.

Compares the fused one-dispatch chain (serve.py synth_vocode) against
the staged path (vocode_buckets: synth-mel -> host n_valid fetch ->
vocode at the smallest covering frame bucket) under two traffic mixes
at flagship dims, max_batch 8, bf16:

  full : no per-request n_frames (gate biased never to fire), every
         request carries 400 frames — the staged path must not lose
         here (the host sync overlaps with the next batch's synth).
  short: every request passes n_frames=100 (a client bounding
         utterance length; the same n_valid shape an early-firing
         trained gate produces) — the staged path should vocode at the
         100-frame bucket and win ~the vocoder's share of the saved
         frames (vocoder is ~130 of ~152 ms per 400-frame dispatch).

Usage: python scripts/exp_vocode_buckets.py [n_requests] [concurrency]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_serve import build_flagship_engine, run_load  # noqa: E402


def main():
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_requests = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    concurrency = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    results = {}

    # three modes: fused (default), auto (shipped --vocode-buckets
    # behavior: per-batch choice, full-length batches stay fused), and
    # forced-staged (synth_vocode removed so every batch goes two-stage
    # — isolates the staged path's full-length cost)
    for name, kwargs, force in (
            ("fused", {}, False),
            ("auto", {"vocode_buckets": (100,)}, False),
            ("staged", {"vocode_buckets": (100,)}, True)):
        engine = build_flagship_engine(**kwargs)
        if force:
            engine._synth_vocode = None
        print(f"[{name}] warmup: {engine.warmup()}", flush=True)
        # one cold load pass per mix to compile any remaining variants
        for nf, mix in ((None, "full"), (100, "short")):
            run_load(engine, 16, 8, n_frames=nf)
            r = run_load(engine, n_requests, concurrency, n_frames=nf)
            results[f"{name}_{mix}"] = r
            print(f"[{name} {mix}] {r['req_per_s']} req/s, "
                  f"p50 {r['p50_ms']} ms, p99 {r['p99_ms']} ms, "
                  f"{r['x_realtime']}x realtime", flush=True)
        engine.shutdown()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
