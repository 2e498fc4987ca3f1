"""Serving runtime: HTTP TTS endpoint with dynamic request batching.

The reference has no serving story (inference.py is a one-shot CLI); this
module provides the production path the framework targets: a warm jitted
synthesis function at fixed shape buckets, a micro-batching queue that
coalesces concurrent requests into one TPU dispatch, and a thread-pool
HTTP front end.

POST /synthesize  {"text": "...", "speaker_id": 0, "sigma": 0.5,
                   "n_frames": 400, "temperature": 1.0, "seed": 1234,
                   "split": false}
  -> audio/wav bytes (Griffin-Lim fallback or WaveGlow when loaded)
  Text longer than the largest bucket is rejected with 413 unless
  "split": true, which sentence-splits and synthesizes the segments as
  one micro-batch. An overloaded queue rejects with 429.
POST /stream      same body -> chunked-transfer audio/wav: bytes flow
                  as synthesis runs (any n_flows + vocoder; see
                  infer/streaming.py). "split": true streams paragraph-
                  length text as one continuous utterance (sentence-
                  split server-side, segments synthesized back to back
                  on the same streamer)
GET /stream-ws    WebSocket (RFC 6455): send one text frame with the
                  same JSON body; receive {"sample_rate","format"} then
                  binary PCM16 frames, then close. Errors are framed
                  JSON instead of a dropped chunked response.
GET /healthz      -> {"status": "ok", "queue_depth": N}
GET /metrics      -> request/batch/error/rejection counters, synthesized
                  audio seconds, recent batch-latency percentiles
GET /models       -> loaded voices; any request body may carry
                  {"model": "name"} to pick one (multi-model serving:
                  several checkpoints resident at once, each with its
                  own batching queue; unknown names are 404)
POST /models      {"name", "config", "checkpoint", "vocoder"?}
                  -> load a new voice at runtime (409 if the name is
                  taken). DELETE /models/<name> unloads one: the
                  engine drains, active streams finish, device memory
                  is freed (409 for the last resident model).
POST /profile     {"seconds": 1.0, "dir"?} -> capture a jax.profiler
                  device trace under load; returns the trace dir for
                  TensorBoard. One capture at a time (409). For live
                  on-demand profiling, --profiler-port starts
                  jax.profiler.start_server for the TensorBoard
                  profile plugin.

Scale-out: --replicas N (or 'auto') keeps N independent single-device
copies of the whole request chain and round-robins micro-batches across
them — the right mode once one chip's max_batch-8 throughput saturates
(batch compute grows ~linearly past B=8, so more chips beat bigger
batches). --mesh remains the tensor-parallel alternative for models too
big for one device.

Stream concurrency: the default pool gives each concurrent stream its
own warm streamer pair (N streams = N dispatch chains). --stream-mux N
instead serves all streams through ONE batched N-slot multiplexer
(infer/multistream.py): one chunk dispatch per tick advances every
active stream and vocoder windows batch across streams — the decoder
step is weight-load-bound, so the batched tick costs about what a
single stream's chunk does.

Run: python -m flowtron_tpu.serve -c config.json -f ckpt [-w vocoder]
     [--port 8080 --max-batch 8 --batch-timeout-ms 20 --max-queue 64]
     [--model other=config2.json:ckpt2:vocoder2 ...] [--replicas auto]
"""

from flowtron_tpu.serve.common import (EngineOverloaded, TextTooLong,
                                       UnknownModel, split_measured)
from flowtron_tpu.serve.engine import SynthesisEngine
from flowtron_tpu.serve.http import make_handler
from flowtron_tpu.serve.cli import main

__all__ = ["EngineOverloaded", "TextTooLong", "UnknownModel",
           "split_measured", "SynthesisEngine", "make_handler", "main"]
