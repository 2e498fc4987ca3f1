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

import argparse
import io
import json
import queue
import re
import threading
import time

import numpy as np


class TextTooLong(ValueError):
    """Request text exceeds the largest compiled text bucket (HTTP 413).

    Replaces the former silent ids[:Tk] truncation: a paragraph-length
    request must never return audio for its prefix as if it were the
    whole input.
    """

    def __init__(self, n_ids, max_ids):
        super().__init__(
            f"text is {n_ids} symbols after the frontend; the largest "
            f"bucket is {max_ids}. Shorten the text or pass "
            f"\"split\": true to sentence-split server-side.")
        self.n_ids = n_ids
        self.max_ids = max_ids


class EngineOverloaded(RuntimeError):
    """Request queue is full (HTTP 429)."""


class UnknownModel(ValueError):
    """Request named a model that is not loaded (HTTP 404)."""

    def __init__(self, name, known):
        super().__init__(f"unknown model {name!r}; loaded models: "
                         f"{sorted(known)} (see GET /models)")


_SENTENCE_SPLIT = re.compile(r"(?<=[.!?;:])\s+")

# queue sentinel: wakes the dispatcher (which forwards it to the
# completion thread) so shutdown() can join both workers cleanly
_SHUTDOWN = object()


def split_measured(text, measure, max_ids):
    """Split text into [(segment, ids)] with len(ids) <= max_ids.

    `measure(segment) -> ids` may be STOCHASTIC (the frontend's
    per-word ARPAbet coin flip at 0 < p_arpabet < 1), so each final
    segment is measured exactly once and those ids are what the caller
    must enqueue — re-measuring could re-roll over the budget. Packing
    uses per-sentence counts measured once (O(n) frontend work, not
    O(n^2) over growing candidates); a packed segment that still
    over-measures (join effects / re-rolls) is bisected at word
    boundaries. Raises TextTooLong only when a single word exceeds the
    budget.
    """
    pieces = []

    def emit(seg):
        ids = measure(seg)
        if len(ids) == 0:
            return
        if len(ids) <= max_ids:
            pieces.append((seg, ids))
            return
        words = seg.split()
        if len(words) <= 1:
            raise TextTooLong(len(ids), max_ids)
        mid = len(words) // 2
        emit(" ".join(words[:mid]))
        emit(" ".join(words[mid:]))

    sentences = [s for s in _SENTENCE_SPLIT.split(text.strip()) if s]
    units = [(s, len(measure(s))) for s in sentences]
    cur, cur_n = [], 0
    for s, n in units:
        if cur and cur_n + 1 + n > max_ids:
            emit(" ".join(cur))
            cur, cur_n = [], 0
        cur_n += (1 if cur else 0) + n
        cur.append(s)
    if cur:
        emit(" ".join(cur))
    return pieces


class SynthesisEngine:
    """Batched synthesis over fixed shape buckets (one jit program per
    (batch, text) bucket; requests are padded up)."""

    def __init__(self, config, flowtron_path, waveglow_path="",
                 max_batch=8, batch_timeout_ms=20.0, text_buckets=(64, 128),
                 n_frames=400, int8=False, quantize="", fused=False,
                 mesh_shape=None, bf16=False, max_queue=64,
                 stream_stall_timeout=30.0, stream_workers=2,
                 stream_acquire_timeout=5.0, replicas=1,
                 vocode_buckets=None, denoise=0.0, stream_mux=0):
        import jax
        import jax.numpy as jnp
        from flowtron_tpu.infer.sampling import load_model_for_inference
        from flowtron_tpu.models import flowtron_infer
        from flowtron_tpu.data import Data

        self.jax, self.jnp = jax, jnp
        self.config = config
        self._ckpt_path = flowtron_path
        self._waveglow_path = waveglow_path
        self.n_frames = n_frames
        self.max_batch = max_batch
        self.batch_timeout = batch_timeout_ms / 1000.0
        self.text_buckets = sorted(text_buckets)
        self.stream_stall_timeout = float(stream_stall_timeout)
        self.stream_acquire_timeout = float(stream_acquire_timeout)

        if mesh_shape and replicas and int(replicas) > 1:
            # replicas are independent single-device programs; a mesh is
            # one multi-device program — the two sharding stories for
            # the same chips can't compose. Mesh wins (it was explicit).
            print("WARNING: --replicas is incompatible with --mesh; "
                  "ignoring replicas")
            replicas = 1
        if mesh_shape and vocode_buckets:
            print("WARNING: --vocode-buckets is not supported with "
                  "--mesh; using the one-dispatch chain")
            vocode_buckets = None
        if mesh_shape and fused:
            # the fused Pallas decoder assumes whole weights in one
            # core's VMEM; TP-sharded params would fail at first-request
            # compile (or silently gather). Mirror the quantize fallback.
            print("WARNING: --fused is incompatible with --mesh "
                  "(VMEM-resident kernel vs TP-sharded weights); "
                  "disabling fused")
            fused = False

        data_config = dict(config["data_config"])
        self.data_config = data_config
        self.params, self.static_cfg = load_model_for_inference(
            config, flowtron_path)
        qmode = quantize or ("w8" if int8 else "")
        if qmode:
            from flowtron_tpu.infer.quantize import \
                quantize_flows_for_inference
            self.params = quantize_flows_for_inference(self.params,
                                                       mode=qmode)
        if bf16:
            # TPU serving dtype: ~+30% over fp32 (mel MAE ~1e-3 scale).
            # Composes with quantized modes: the remaining float leaves
            # (biases, encoder, unquantized projections) go bf16 while
            # quantized leaf-dicts keep their int payload + fp32 scales
            # (qdot dequantizes into the activation dtype). Leaving
            # those float leaves fp32 poisoned the bf16 scan carry
            # (carry-dtype mismatch at first compile).
            def to_bf16(t):
                if isinstance(t, dict):
                    if "q" in t or "q4" in t:
                        return t
                    return {k: to_bf16(v) for k, v in t.items()}
                if isinstance(t, (list, tuple)):
                    return type(t)(to_bf16(v) for v in t)
                if hasattr(t, "dtype") and t.dtype == jnp.float32:
                    return t.astype(jnp.bfloat16)
                return t

            self.params = to_bf16(self.params)
        self._bf16 = bool(bf16)

        from flowtron_tpu.data.dataset import data_kwargs
        self.frontend = Data(data_config["training_files"],
                             **data_kwargs(data_config))

        self.wg = None
        if waveglow_path:
            from flowtron_tpu.vocoder import load_waveglow
            self.wg = load_waveglow(waveglow_path)
            if bf16:
                wgp, wgc = self.wg
                self.wg = (jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32
                    else x, wgp), wgc)

        def synth(params, residual, sids, text, in_lens, temperature):
            return flowtron_infer(params, self.static_cfg, residual, sids,
                                  text, temperature=temperature,
                                  gate_threshold=0.5, in_lens=in_lens,
                                  fused="early" if fused else False)

        _zshape = (self.static_cfg["n_mel_channels"], n_frames)
        # NOTE: the int64->int32 wrap of large seeds is byte-identical
        # to the per-request PRNGKey(int(seed)) this replaced — PRNGKey
        # keeps only the low 32 bits under default x64-disabled JAX, and
        # two's-complement preserves that bit pattern (verified).
        def sample_z(seeds, sigmas):
            return jax.vmap(
                lambda s, sg: sg * jax.random.normal(
                    jax.random.PRNGKey(s), _zshape))(seeds, sigmas)

        self._sample_z = jax.jit(sample_z)

        # whole request chain — latents -> AR mel -> gate masking ->
        # vocoder -> peak-normalized int16 — as ONE device dispatch: the
        # old path paid three tunnel round-trips per micro-batch
        # (sample_z, synth, then a HOST n_valid fetch to bucket mels for
        # vocode). Vocoding runs at the fixed n_frames length (frames
        # past each stream's gate are silenced on device), trading a
        # little compute on short utterances for one program, no
        # host-sync, and no per-length vocoder recompiles.
        self._synth_vocode = None
        synth_vocode = None
        vocode_norm = None
        self._denoise = float(denoise or 0.0)
        self._denoiser = None
        if self.wg is not None:
            _wg_cfg2 = self.wg[1]

            def synth_mel(params, seeds, sigmas, sids, text, in_lens,
                          temperature, frames_cap):
                res = sample_z(seeds, sigmas)
                if bf16:
                    res = res.astype(jnp.bfloat16)
                mel, _attns, n_valid = synth(params, res, sids, text,
                                             in_lens, temperature)
                # per-request n_frames caps BEFORE vocoding, so peak
                # normalization sees exactly the returned region
                n_valid = jnp.minimum(jnp.maximum(1, n_valid),
                                      frames_cap)
                N = mel.shape[2]
                valid_f = jnp.arange(N)[None, :] < n_valid[:, None]
                mel = jnp.where(valid_f[:, None, :],
                                mel, jnp.asarray(np.log(1e-5), mel.dtype))
                return mel, n_valid

            # WaveGlow bias denoiser (reference notebook cell 7; the
            # inference CLI's -d): bias spectrum estimated once at init.
            # Batch path: spectral subtraction runs INSIDE the jitted
            # chain. Stream path: a host-side StreamingDenoiser applies
            # the same subtraction with overlap-exact chunked framing.
            denoiser = None
            if denoise and float(denoise) > 0:
                from flowtron_tpu.vocoder.denoiser import Denoiser
                dc = self.data_config
                denoiser = Denoiser(
                    self.wg[0], _wg_cfg2,
                    filter_length=dc["filter_length"],
                    hop_length=dc["hop_length"],
                    win_length=dc["win_length"],
                    n_mel_channels=self.static_cfg["n_mel_channels"])
            # the stream path reuses the bias spectrum through a
            # host-side StreamingDenoiser (exact chunked framing)
            self._denoiser = denoiser

            _ng = _wg_cfg2["n_group"]
            _nes = _wg_cfg2["n_early_size"]
            _nee = _wg_cfg2["n_early_every"]
            _nf_wg = _wg_cfg2["n_flows"]
            from flowtron_tpu.vocoder.waveglow import (
                waveglow_infer_z, waveglow_n_remaining)
            _nrem = waveglow_n_remaining(_wg_cfg2)
            _Tg_full = n_frames * 256 // _ng

            def vocode_norm(wgp, mel, n_valid, seeds, strengths):
                # per-request vocoder latents: keyed on the request
                # seed (domain-separated from the mel latents) and
                # drawn at the full n_frames length then sliced, so a
                # request's audio realization does not depend on the
                # batch-size bucket it lands in or the vocode frame
                # bucket it shares — the previous PRNGKey(0)-at-batch-
                # shape draw changed every sample when either varied
                Tg = mel.shape[2] * 256 // _ng
                keys = jax.vmap(lambda s: jax.random.fold_in(
                    jax.random.PRNGKey(s), 1986))(seeds)

                def row_z(k):
                    zm = 0.8 * jax.random.normal(
                        jax.random.fold_in(k, 0),
                        (_nrem, _Tg_full), mel.dtype)
                    zes = [
                        0.8 * jax.random.normal(
                            jax.random.fold_in(k, 1 + f),
                            (_nes, _Tg_full), mel.dtype)
                        if (f % _nee == 0 and f > 0) else None
                        for f in range(_nf_wg)]
                    return zm, zes

                z_main, z_early = jax.vmap(row_z)(keys)
                z_main = z_main[:, :, :Tg]
                z_early = [None if z is None else z[:, :, :Tg]
                           for z in z_early]
                audio = waveglow_infer_z(wgp, _wg_cfg2, mel, z_main,
                                         z_early).astype(jnp.float32)
                if denoiser is not None:
                    T = audio.shape[1]
                    audio = denoiser(audio,
                                     strength=strengths[:, None, None])
                    # ISTFT framing can shorten the tail; restore the
                    # static length so the sample mask below lines up
                    audio = jnp.pad(
                        audio, ((0, 0),
                                (0, max(0, T - audio.shape[1]))))[:, :T]
                n_samples = n_valid.astype(jnp.int32) * 256
                valid = (jnp.arange(audio.shape[1])[None, :]
                         < n_samples[:, None])
                peak = jnp.max(jnp.abs(audio) * valid, axis=1,
                               keepdims=True)
                out = audio / jnp.maximum(peak, 1e-8) * valid
                return jnp.clip(out * 32767.0, -32767, 32767
                                ).astype(jnp.int16)

            def synth_vocode(params, wgp, seeds, sigmas, sids, text,
                             in_lens, temperature, frames_cap,
                             strengths):
                mel, n_valid = synth_mel(params, seeds, sigmas, sids,
                                         text, in_lens, temperature,
                                         frames_cap)
                return vocode_norm(wgp, mel, n_valid, seeds,
                                   strengths), n_valid

        self._synth_mel = self._vocode_norm = None
        self._vocode_buckets = None
        if vocode_buckets and self.wg is not None:
            bs = sorted({int(b) for b in vocode_buckets
                         if 0 < int(b) < n_frames})
            if bs:
                self._vocode_buckets = tuple(bs) + (n_frames,)
            else:
                print("WARNING: vocode_buckets has no bucket below "
                      f"n_frames={n_frames}; staged vocoding disabled")

        self._batch_mult = 1
        if mesh_shape:
            # multi-chip serving: weights tensor-parallel over 'model',
            # requests data-parallel over 'data' (GSPMD inserts the
            # per-step collectives inside the AR scan over ICI)
            from flowtron_tpu.parallel.mesh import (
                make_mesh, place_params, param_shardings, data_sharded,
                replicated)
            mesh = make_mesh(tuple(mesh_shape), ("data", "model"))
            self.params = place_params(self.params, mesh)
            pshard = param_shardings(self.params, mesh)
            bshard = data_sharded(mesh)
            repl = replicated(mesh)
            self._batch_mult = int(mesh.shape["data"])
            self._synth = jax.jit(
                synth, in_shardings=(pshard, bshard, bshard, bshard,
                                     bshard, None))
            if synth_vocode is not None:
                # vocoder weights are committed single-device after
                # load/bf16-cast; replicate them onto the mesh or the
                # fused jit raises an incompatible-devices error
                self.wg = (jax.device_put(self.wg[0], repl), self.wg[1])
                self._synth_vocode = jax.jit(
                    synth_vocode,
                    in_shardings=(pshard, repl, bshard, bshard, bshard,
                                  bshard, bshard, None, bshard, bshard))
        else:
            self._synth = jax.jit(synth)
            # gate/length-aware two-stage vocoding: the vocoder
            # dominates the fused dispatch (~130 of 152 ms at flagship
            # dims) yet runs the engine-fixed n_frames even when every
            # stream's gate (or per-request n_frames cap) ended the
            # utterance early. With vocode_buckets set, dispatch splits
            # into synth-mel (device) -> host n_valid fetch -> vocode at
            # the smallest bucket covering max(n_valid). The host sync
            # costs nothing under load: the dispatcher/completion split
            # lets synth of batch k+1 overlap the fetch+vocode of batch
            # k. Buckets bound the compiled program set; n_frames is
            # always the last bucket.
            if self._vocode_buckets is not None:
                self._synth_mel = jax.jit(synth_mel)
                self._vocode_norm = jax.jit(vocode_norm)
            if synth_vocode is not None:
                # kept alongside the staged pair: the dispatcher picks
                # per batch — fused when every request runs full-length
                # (no extra dispatch), staged when the batch's n_frames
                # caps fit a smaller bucket (vocoder time scales down)
                self._synth_vocode = jax.jit(synth_vocode)

        # data-parallel replicas: N independent single-device copies of
        # the whole request chain, round-robin dispatched. The serving
        # sweeps showed throughput saturates per chip at max_batch 8
        # because batch compute scales ~linearly past B=8 — the scale-out
        # lever is more chips running INDEPENDENT programs (no
        # collectives, full latency isolation), not bigger batches or a
        # TP mesh. jit specializes per committed-device placement, so
        # replica k's dispatch runs entirely on devices[k].
        self._replica_devices = None
        self._replica_params = None
        self._replica_wg = None
        R = max(1, int(replicas or 1))
        if R > 1:
            devs = jax.local_devices()
            if R > len(devs):
                print(f"WARNING: --replicas {R} > {len(devs)} local "
                      f"devices; clamping")
                R = len(devs)
            if R > 1:
                self._replica_devices = devs[:R]
                self._replica_params = [
                    jax.device_put(self.params, d)
                    for d in self._replica_devices]
                if self.wg is not None:
                    self._replica_wg = [
                        jax.device_put(self.wg[0], d)
                        for d in self._replica_devices]
        self._n_replicas = R if self._replica_devices else 1
        self._rr = 0  # round-robin cursor (dispatcher thread only)

        # streaming path: neural vocoder required. Any n_flows streams
        # (multi-flow models run the gated prelude offline — see
        # infer/streaming.py). A POOL of warm streamer pairs allows
        # `stream_workers` concurrent streams (beyond that, requests
        # wait for a free pair, then EngineOverloaded); instances after
        # the first reuse the persistent XLA compile cache, so the pool
        # costs tracing only. Chunks cross to the HTTP handler through
        # a bounded queue so a stalled client cannot pin a pair
        # (stream_stall_timeout).
        # --stream-mux N replaces the pool with ONE batched multiplexer
        # (infer/multistream.py): N concurrent streams share a single
        # chunk dispatch per tick and batched vocoder windows, instead
        # of N independent dispatch chains. One device program — with
        # --replicas the mux runs on the base device (scale-out for
        # muxed streaming = one process per device).
        self._mux = None
        self._mux_routes = {}
        self._mux_lock = threading.Lock()
        if self.wg is not None and int(stream_mux) > 0:
            from flowtron_tpu.infer.multistream import MultiStreamTTS
            wg_params, wg_cfg = self.wg
            self._mux = MultiStreamTTS(
                self.params, self.static_cfg, wg_params, wg_cfg,
                slots=int(stream_mux), chunk_frames=40,
                text_len=self.text_buckets[-1], max_frames=n_frames,
                gate_threshold=0.5)
            self._mux_wake = threading.Event()
            # the stepper thread starts at the end of __init__ (it
            # reads _closed, defined below)
            self._mux_thread = threading.Thread(target=self._mux_loop,
                                                daemon=True)

        self._stream_pool = None
        if self.wg is not None and self._mux is None:
            from flowtron_tpu.infer.streaming import (
                StreamingMelSynthesizer, StreamingVocoder)
            wg_params, wg_cfg = self.wg
            self._stream_pool = queue.Queue()
            for i in range(max(1, int(stream_workers))):
                if self._replica_devices is not None:
                    # spread warm streamer pairs across the replica
                    # devices so concurrent streams don't contend
                    r = i % self._n_replicas
                    p_i = self._replica_params[r]
                    wg_i = self._replica_wg[r]
                else:
                    p_i, wg_i = self.params, wg_params
                self._stream_pool.put((
                    StreamingMelSynthesizer(p_i, self.static_cfg,
                                            chunk_frames=40,
                                            gate_threshold=0.5,
                                            max_frames=n_frames,
                                            fused="early" if fused
                                            else False),
                    StreamingVocoder(wg_i, wg_cfg,
                                     jax.random.PRNGKey(0), sigma=0.8,
                                     dtype=jnp.bfloat16 if bf16
                                     else jnp.float32)))

        # serving metrics (GET /metrics): counters + recent batch
        # latencies, updated by the batching worker
        self._metrics = {"requests": 0, "batches": 0, "errors": 0,
                         "audio_seconds": 0.0, "stream_requests": 0,
                         "rejected_too_long": 0, "rejected_overload": 0,
                         "text_clamped": 0, "stream_stalls": 0,
                         "replica_batches": [0] * self._n_replicas,
                         # staged (two-stage vocode) observability:
                         # which frame buckets batches actually land in
                         "staged_batches": 0,
                         "vocode_bucket_hits": dict.fromkeys(
                             self._vocode_buckets or (), 0)}
        self._recent_batch_ms = []
        self._metrics_lock = threading.Lock()

        self._stream_workers = max(1, int(stream_workers))
        self._closed = False
        # makes the closed-check + enqueue/pool-checkout atomic against
        # shutdown(): without it a submit could pass the check, lose the
        # CPU, and enqueue into a queue shutdown already drained — its
        # done.wait() would then block forever
        self._lifecycle_lock = threading.Lock()
        # bounded: overload returns 429 instead of unbounded latency
        self._queue = queue.Queue(maxsize=max(1, int(max_queue)))
        # dispatch/complete pipeline: maxsize=1 means at most two
        # batches touch the device pipeline (one executing, one queued)
        # while the completion thread drains results — double buffering
        # without unbounded in-flight work. With R replicas the bound
        # scales to 2R-1 so every device keeps its own double buffer.
        self._inflight = queue.Queue(maxsize=2 * self._n_replicas - 1)
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        self._completer = threading.Thread(target=self._complete_loop,
                                           daemon=True)
        self._completer.start()
        if self._mux is not None:
            self._mux_thread.start()

    def _count(self, name, by=1):
        with self._metrics_lock:
            self._metrics[name] += by

    @property
    def can_stream(self):
        return self._stream_pool is not None or self._mux is not None

    @property
    def active_mux_streams(self):
        """Streams currently holding a mux slot (0 without --stream-mux)."""
        return self._mux.active if self._mux is not None else 0

    def _text_to_ids(self, text):
        """Frontend + validation shared by both entry points. Raises
        ValueError on empty text, TextTooLong past the largest bucket
        (callers count rejected_too_long only where the error actually
        propagates — a split=True recovery is not a rejection)."""
        ids = self.frontend.get_text(text)
        if len(ids) == 0:
            raise ValueError("empty text after cleaning")
        if len(ids) > self.text_buckets[-1]:
            raise TextTooLong(len(ids), self.text_buckets[-1])
        return ids

    def stream(self, text, speaker_id=0, sigma=0.5, seed=1234,
               n_frames=None, temperature=None, split=False,
               denoise=None):
        """Mono int16 PCM chunk generator (time-to-first-audio is one
        mel chunk + vocoder lookahead, plus the offline gated prelude
        for multi-flow models). Requires a loaded vocoder; amplitude
        uses a fixed clip scale (a streaming response cannot be
        normalized to its own global peak). Engines started with -d
        denoise streamed audio too (host-side StreamingDenoiser, same
        bias spectrum, overlap-exact at chunk boundaries); `denoise`
        overrides the strength per request, like the batch path.

        split=True streams paragraph-length text as ONE continuous PCM
        stream: the text is sentence-split into bucket-sized segments
        (split_measured) and synthesized back to back on the same
        checked-out streamer — the audience hears a single utterance
        while segment k+1 begins as soon as k's frames finish.

        Validation runs eagerly (not at first next()) so HTTP callers
        can still return 4xx/5xx before committing to a 200 + chunked
        response."""
        if self._closed:
            raise RuntimeError("engine is shut down")
        if self._stream_pool is None and self._mux is None:
            raise RuntimeError(
                "streaming requires a neural vocoder (-w)")
        if n_frames is not None:  # same clamp as the batch path; a
            # non-int raises here, before the 200 header is committed
            n_frames = max(1, min(int(n_frames), self.n_frames))
        if temperature is not None:
            temperature = float(temperature)
        if denoise is not None:
            if self._denoiser is None:
                raise ValueError(
                    "per-request denoise requires an engine started "
                    "with -d (the bias spectrum is estimated at init)")
            denoise = float(denoise)
        else:
            denoise = self._denoise
        try:
            ids = self.frontend.get_text(text)
            if len(ids) == 0:
                raise ValueError("empty text after cleaning")
            if len(ids) > self.text_buckets[-1]:
                if not split:
                    raise TextTooLong(len(ids), self.text_buckets[-1])
                pieces = split_measured(text, self.frontend.get_text,
                                        self.text_buckets[-1])
                segments = [p_ids for _, p_ids in pieces]
            else:
                segments = [ids]
        except TextTooLong:
            self._count("rejected_too_long")
            raise
        sid = int(self.frontend.speaker_ids.get(int(speaker_id), 0))
        if self._mux is not None:
            return self._stream_gen_mux(segments, sid, sigma, seed,
                                        n_frames, temperature, denoise)
        # EAGER pool checkout: overload surfaces here as 429, before
        # the caller commits to a 200 + chunked response. The pool
        # object is captured under the lifecycle lock (shutdown() nulls
        # the attribute).
        with self._lifecycle_lock:
            if self._closed or self._stream_pool is None:
                raise RuntimeError("engine is shut down")
            pool = self._stream_pool
        try:
            pair = pool.get(timeout=self.stream_acquire_timeout)
        except queue.Empty:
            if self._closed:  # shutdown reclaimed the pairs meanwhile
                raise RuntimeError("engine is shut down")
            self._count("rejected_overload")
            raise EngineOverloaded(
                "all streaming workers busy; retry later")
        self._count("stream_requests")
        return self._stream_gen(pool, pair, segments, sid, sigma, seed,
                                n_frames, temperature, denoise)

    def _stream_gen(self, pool, pair, segments, sid, sigma, seed,
                    n_frames, temperature, denoise=0.0):
        """The producer thread owns the checked-out streamer pair;
        chunks cross to the caller through a bounded queue. The thread
        starts EAGERLY (not at first next()), so the pair always returns
        to the pool even if the generator is dropped unconsumed; a
        consumer that stalls longer than stream_stall_timeout (dead
        client socket) aborts the stream instead of pinning the pair."""
        from flowtron_tpu.infer.streaming import pump_stream
        jnp = self.jnp
        out_q = queue.Queue(maxsize=4)
        cancel = threading.Event()
        # captured now: shutdown() nulls engine attributes under live
        # streams (the streamer pair equally holds its own params)
        den = self._denoiser

        def emit(samples):
            """float audio -> PCM16 on the queue; False aborts."""
            if samples.size == 0:
                return True
            pcm = (np.clip(samples, -1.0, 1.0) * 32767).astype(np.int16)
            try:
                out_q.put(pcm, timeout=self.stream_stall_timeout)
                return True
            except queue.Full:
                self._count("stream_stalls")
                return False

        def produce():
            err = None
            try:
                mel_s, voc = pair
                for si, ids in enumerate(segments):
                    sd = None
                    if denoise and denoise > 0:
                        from flowtron_tpu.vocoder.denoiser import (
                            StreamingDenoiser)
                        # per segment, like the batch path's
                        # per-utterance denoise (segments are separate
                        # synthesized utterances)
                        sd = StreamingDenoiser(den, strength=denoise)
                    n = len(ids)
                    Tk = self._bucket(n)
                    text_pad = np.zeros((1, Tk), np.int64)
                    text_pad[0, :n] = np.asarray(ids)
                    # independent latents per segment, deterministic in
                    # (seed, segment index)
                    k_mel, k_voc = self.jax.random.split(
                        self.jax.random.fold_in(
                            self.jax.random.PRNGKey(int(seed)), si))
                    voc.reset(k_voc)
                    for audio in pump_stream(
                            mel_s, voc, k_mel, jnp.asarray([sid]),
                            jnp.asarray(text_pad), sigma=float(sigma),
                            in_lens=jnp.asarray([n]),
                            temperature=temperature,
                            max_frames=n_frames):
                        if cancel.is_set():
                            return
                        out = np.asarray(audio[0])
                        if sd is not None:
                            out = sd.feed(out)
                        if not emit(out):
                            return
                    if sd is not None:
                        if cancel.is_set():
                            return
                        if not emit(sd.flush()):
                            return
            except Exception as e:  # surfaced to the consumer
                err = e
            finally:
                pool.put(pair)
                try:
                    out_q.put(err, timeout=5)
                except queue.Full:
                    pass

        t = threading.Thread(target=produce, daemon=True)
        t.start()

        def consume():
            try:
                while True:
                    try:
                        item = out_q.get(timeout=1.0)
                    except queue.Empty:
                        # sentinel can be lost when a stall-aborted
                        # producer finds the queue full; liveness check
                        if not t.is_alive():
                            break
                        continue
                    if item is None:
                        break
                    if isinstance(item, Exception):
                        raise item
                    yield item
            finally:
                cancel.set()
                # drain so a producer blocked on put() can observe
                # cancel and return the pair
                while t.is_alive():
                    try:
                        out_q.get_nowait()
                    except queue.Empty:
                        time.sleep(0.005)

        return consume()

    # -- batched multi-stream path (--stream-mux) -------------------------
    def _mux_loop(self):
        """The single stepper thread: one MultiStreamTTS.step() tick
        advances every active stream (one batched chunk dispatch +
        width-grouped vocoder dispatches); float audio is routed to
        per-stream consumer queues. A consumer that stalls past
        stream_stall_timeout is aborted (close + route dropped) so a
        dead client cannot pin its slot."""
        mux = self._mux
        while not self._closed:
            if mux.active == 0:
                self._mux_wake.wait(timeout=0.25)
                self._mux_wake.clear()
                continue
            try:
                events = mux.step()
            except Exception as e:
                # a failing tick poisons every active stream: surface
                # the error to all consumers rather than spinning
                with self._mux_lock:
                    routes, self._mux_routes = self._mux_routes, {}
                for q in routes.values():
                    try:
                        q.put_nowait(e)
                    except queue.Full:
                        pass
                continue
            with self._mux_lock:
                routes = dict(self._mux_routes)
            for h, audio, done in events:
                q = routes.get(h)
                if q is None:
                    continue
                try:
                    # never blocks in practice: each route queue holds a
                    # whole utterance (see _mux_open_routed), so the
                    # SHARED stepper is wait-free — one stalled consumer
                    # must not stall every stream's cadence. Full means
                    # the sizing invariant broke: treat as dead client.
                    q.put_nowait((audio, done))
                except queue.Full:
                    self._count("stream_stalls")
                    mux.close(h)
                    done = True
                if done:
                    with self._mux_lock:
                        self._mux_routes.pop(h, None)

    def _mux_open_routed(self, key, sid, ids, sigma, temperature,
                         n_frames):
        """open() a mux slot with its consumer route registered BEFORE
        the stepper can emit for it (route-then-open would race)."""
        from flowtron_tpu.infer.multistream import MuxFull
        # sized for the whole utterance (+flush +slack): the stepper
        # must never block on a consumer (see _mux_loop)
        q = queue.Queue(maxsize=self._mux.max_frames
                        // self._mux.C + 4)
        with self._lifecycle_lock:
            if self._closed or self._mux is None:
                raise RuntimeError("engine is shut down")
        try:
            h = self._mux.open(
                key, sid, ids, sigma=float(sigma),
                temperature=(1.0 if temperature is None
                             else float(temperature)),
                max_frames=n_frames)
        except MuxFull:
            self._count("rejected_overload")
            raise EngineOverloaded(
                "all mux stream slots busy; retry later")
        with self._mux_lock:
            self._mux_routes[h] = q
        self._mux_wake.set()
        return h, q

    def _stream_gen_mux(self, segments, sid, sigma, seed, n_frames,
                        temperature, denoise=0.0):
        """Mux counterpart of _stream_gen: the first segment's slot is
        opened EAGERLY (429 before the 200 header, same contract as
        the pool checkout); later split-segments retry for a free slot
        between ticks. Audio semantics match the pool path: the same
        (seed, segment) key derivation, so a muxed stream yields the
        same utterance as a pooled one."""
        import jax
        den = self._denoiser
        key0 = jax.random.fold_in(jax.random.PRNGKey(int(seed)), 0)
        h0, q0 = self._mux_open_routed(key0, sid, segments[0], sigma,
                                       temperature, n_frames)
        self._count("stream_requests")

        def consume():
            from flowtron_tpu.vocoder.denoiser import StreamingDenoiser
            hq = (h0, q0)
            try:
                for si, ids in enumerate(segments):
                    if hq is None:   # segments past the first
                        key = jax.random.fold_in(
                            jax.random.PRNGKey(int(seed)), si)
                        deadline = time.time() + \
                            self.stream_stall_timeout
                        while True:
                            try:
                                hq = self._mux_open_routed(
                                    key, sid, ids, sigma, temperature,
                                    n_frames)
                                break
                            except EngineOverloaded:
                                if time.time() > deadline:
                                    return   # truncate: slot starved
                                time.sleep(0.05)
                    h, q = hq
                    sd = StreamingDenoiser(den, strength=denoise) \
                        if denoise and denoise > 0 else None
                    while True:
                        item = q.get(
                            timeout=self.stream_stall_timeout + 60)
                        if isinstance(item, Exception):
                            raise item
                        audio, done = item
                        if sd is not None:
                            audio = sd.feed(audio)
                        if audio.size:
                            yield (np.clip(audio, -1.0, 1.0)
                                   * 32767).astype(np.int16)
                        if done:
                            break
                    if sd is not None:
                        tail = sd.flush()
                        if tail.size:
                            yield (np.clip(tail, -1.0, 1.0)
                                   * 32767).astype(np.int16)
                    hq = None
            finally:
                if hq is not None:   # consumer dropped mid-stream
                    self._mux.close(hq[0])
                    with self._mux_lock:
                        self._mux_routes.pop(hq[0], None)

        return consume()

    # -- request path -----------------------------------------------------
    def submit(self, text, speaker_id=0, sigma=0.5, seed=1234,
               n_frames=None, temperature=None, split=False,
               denoise=None):
        """Blocking: returns (wav_int16, sample_rate).

        Raises TextTooLong when the text exceeds the largest bucket,
        unless split=True — then it is sentence-split and the segments
        are enqueued together (they coalesce into one micro-batch) and
        the audio concatenated. Raises EngineOverloaded when the
        request queue is full. `denoise` overrides the engine's -d
        strength for this request (only on engines started with -d).
        """
        if self._closed:
            raise RuntimeError("engine is shut down")
        if denoise is not None:
            if not self._denoise:
                raise ValueError(
                    "per-request denoise requires an engine started "
                    "with -d (the bias spectrum is estimated at init)")
            denoise = float(denoise)
        try:
            ids = self._text_to_ids(text)
            pieces = [(text, ids)]
        except TextTooLong:
            if not split:
                self._count("rejected_too_long")
                raise
            try:
                pieces = split_measured(text, self.frontend.get_text,
                                        self.text_buckets[-1])
            except TextTooLong:
                self._count("rejected_too_long")  # a single huge word
                raise
            if not pieces:
                raise ValueError("empty text after cleaning")

        slots = []
        for i, (seg, ids) in enumerate(pieces):
            done = threading.Event()
            slot = {}
            item = (ids, speaker_id, sigma, int(seed) + i, n_frames,
                    temperature, denoise, slot, done)
            with self._lifecycle_lock:
                if self._closed:  # atomic vs shutdown's queue drain
                    for s, _d in slots:
                        s["cancelled"] = True
                    raise RuntimeError("engine is shut down")
                try:
                    self._queue.put_nowait(item)
                except queue.Full:
                    self._count("rejected_overload")
                    # already-queued segments have no waiter: mark them
                    # so the worker skips their (discarded) synthesis
                    for s, _d in slots:
                        s["cancelled"] = True
                    raise EngineOverloaded(
                        f"request queue full ({self._queue.maxsize}); "
                        "retry later")
            slots.append((slot, done))
        for slot, done in slots:
            done.wait()
        for slot, _ in slots:
            if "error" in slot:
                raise RuntimeError(slot["error"])
        wav = np.concatenate([slot["wav"] for slot, _ in slots]) \
            if len(slots) > 1 else slots[0][0]["wav"]
        return wav, self.data_config["sampling_rate"]

    @property
    def queue_depth(self):
        return self._queue.qsize()

    # -- batching worker ---------------------------------------------------
    def _bucket(self, n):
        for b in self.text_buckets:
            if n <= b:
                return b
        return self.text_buckets[-1]

    def _loop(self):
        """Dispatcher: gathers micro-batches and launches them on the
        device WITHOUT waiting for results. JAX dispatch is async (the
        returned arrays are futures; fetching blocks), so handing the
        in-flight handles to the completion thread lets the device start
        batch k+1 while batch k's audio is still transferring to the
        host and being distributed — the device never idles between
        micro-batches. The in-flight queue is bounded (double
        buffering): under overload we stop dispatching, not pile device
        work."""
        while True:
            first = self._queue.get()
            if first is _SHUTDOWN:
                self._inflight.put(_SHUTDOWN)
                return
            batch = [first]
            stop = False
            deadline = time.time() + self.batch_timeout
            while len(batch) < self.max_batch:
                timeout = deadline - time.time()
                if timeout <= 0:
                    break
                try:
                    item = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if item is _SHUTDOWN:
                    stop = True
                    break
                batch.append(item)
            t0 = time.time()
            try:
                handles = self._dispatch_batch(batch)
            except Exception as e:  # pragma: no cover
                self._fail_batch(batch, e)
                handles = None
            if handles is not None:
                self._inflight.put((batch, handles, t0))
            if stop:
                self._inflight.put(_SHUTDOWN)
                return

    def _complete_loop(self):
        """Completion worker: blocks on the device->host fetch of each
        in-flight batch (FIFO, so device-queue order is preserved),
        distributes audio to the waiting requests, and runs any
        host-side vocoding (Griffin-Lim engines) off the dispatch
        path."""
        while True:
            item = self._inflight.get()
            if item is _SHUTDOWN:
                return
            batch, handles, t0 = item
            try:
                self._complete_batch(batch, handles)
                with self._metrics_lock:
                    self._metrics["requests"] += len(batch)
                    self._metrics["batches"] += 1
                    self._recent_batch_ms.append(
                        (time.time() - t0) * 1e3)
                    del self._recent_batch_ms[:-100]
            except Exception as e:  # pragma: no cover
                self._fail_batch(batch, e)

    def _fail_batch(self, batch, e):
        with self._metrics_lock:
            self._metrics["errors"] += len(batch)
        for *_, slot, done in batch:
            slot["error"] = repr(e)
            done.set()

    def metrics(self):
        with self._metrics_lock:
            recent = list(self._recent_batch_ms)
            out = dict(self._metrics)
            out["replica_batches"] = list(out["replica_batches"])
            out["vocode_bucket_hits"] = {
                str(k): v for k, v in out["vocode_bucket_hits"].items()}
        out["queue_depth"] = self.queue_depth
        if self._mux is not None:
            out["mux_active_streams"] = self.active_mux_streams
            out["mux_slots"] = self._mux.slots
        if recent:
            r = sorted(recent)
            out["batch_ms_p50"] = round(r[len(r) // 2], 1)
            out["batch_ms_p90"] = round(r[int(len(r) * 0.9)], 1)
        return out

    def _dispatch_batch(self, batch):
        """Build the padded host arrays and launch the device work.
        Returns opaque handles (device-array futures + host metadata)
        for _complete_batch, or None when every request in the batch was
        cancelled. Does NOT block on device results."""
        jnp = self.jnp

        # drop segments whose submit aborted mid-split (overload):
        # nobody waits on them; don't spend device time
        batch[:] = [item for item in batch
                    if not item[-2].get("cancelled")]
        if not batch:
            return None

        Tk = self._bucket(max(len(ids) for ids, *_ in batch))
        # bucket the batch dim to a power of two (bounded set of
        # compiled programs under bursty load) and to a multiple of the
        # mesh's data axis; padded rows duplicate row 0
        B = 1
        while B < len(batch):
            B *= 2
        m = self._batch_mult
        B = ((B + m - 1) // m) * m
        text_pad = np.zeros((B, Tk), np.int64)
        in_lens = np.zeros((B,), np.int64)
        sids = np.zeros((B,), np.int64)
        seeds = np.zeros((B,), np.int64)
        sigmas = np.full((B,), 0.5, np.float32)
        temps = np.ones((B,), np.float32)
        frames_cap = np.full((B,), self.n_frames, np.int64)
        strengths = np.full((B,), self._denoise, np.float32)
        for b, (ids, sid, sigma, seed, nf, temp, dstr, _, _) in \
                enumerate(batch):
            n = len(ids)
            if n > Tk:  # unreachable post-validation; never truncate
                # silently — count and clamp defensively
                self._count("text_clamped")
                print(f"WARNING: text of {n} ids clamped to bucket {Tk}")
                n = Tk
            text_pad[b, :n] = ids[:n]
            in_lens[b] = n
            sids[b] = int(self.frontend.speaker_ids.get(int(sid), 0))
            seeds[b] = int(seed)
            sigmas[b] = float(sigma)
            if temp is not None:
                temps[b] = float(temp)
            if nf is not None:
                frames_cap[b] = max(1, min(int(nf), self.n_frames))
            if dstr is not None:
                strengths[b] = dstr
        for b in range(len(batch), B):  # mesh padding: duplicate row 0
            text_pad[b], in_lens[b] = text_pad[0], in_lens[0]
            sids[b], seeds[b], sigmas[b] = sids[0], seeds[0], sigmas[0]
            temps[b] = temps[0]

        # temperature: a () scalar when uniform (keeps the fused-kernel
        # path, whose SMEM slot is scalar), a (B, 1) vector otherwise
        # (broadcasts inside attention_step; the fused dispatch falls
        # back to the scan path for size>1 — see ar_step_infer)
        if np.all(temps == temps[0]):
            temp_arg = jnp.asarray(temps[0], jnp.float32)
        else:
            temp_arg = jnp.asarray(temps[:, None])

        # replica selection (round-robin; dispatcher thread only). The
        # jitted programs follow the COMMITTED device of the params, so
        # picking replica r runs the whole chain on its device while
        # the other replicas' in-flight batches proceed in parallel.
        params, wgp = self.params, (self.wg[0] if self.wg else None)
        rep_dev = None
        if self._replica_devices is not None:
            r = self._rr % self._n_replicas
            self._rr += 1
            rep_dev = self._replica_devices[r]
            params = self._replica_params[r]
            if self._replica_wg is not None:
                wgp = self._replica_wg[r]
            with self._metrics_lock:
                self._metrics["replica_batches"][r] += 1

        # per-batch path choice (measured, scripts/exp_vocode_buckets.py
        # on v5e): staged vocoding wins +42% req/s when the batch's
        # n_frames caps fit a sub-n_frames bucket, but costs two extra
        # tunnel dispatches when the batch runs full-length — so a batch
        # whose caps don't fit a smaller bucket keeps the fused
        # one-dispatch chain. Gate-only early endings (no client cap)
        # are unknown host-side and also stay fused.
        staged = self._synth_mel is not None and (
            self._synth_vocode is None  # forced (tests/operators)
            or int(frames_cap[:len(batch)].max())
            <= self._vocode_buckets[-2])
        if staged:
            # two-stage: mel now; the completion thread fetches n_valid
            # and vocodes at the smallest covering frame bucket
            mel_dev, n_valid_dev = self._synth_mel(
                params, jnp.asarray(seeds), jnp.asarray(sigmas),
                jnp.asarray(sids), jnp.asarray(text_pad),
                jnp.asarray(in_lens), temp_arg, jnp.asarray(frames_cap))
            return ("staged", (mel_dev, wgp, jnp.asarray(seeds),
                               jnp.asarray(strengths)),
                    n_valid_dev, None)
        if self._synth_vocode is not None:
            # latents -> mel -> vocoder -> int16, ONE device dispatch
            audio_dev, n_valid_dev = self._synth_vocode(
                params, wgp, jnp.asarray(seeds),
                jnp.asarray(sigmas), jnp.asarray(sids),
                jnp.asarray(text_pad), jnp.asarray(in_lens), temp_arg,
                jnp.asarray(frames_cap), jnp.asarray(strengths))
            return ("fused", audio_dev, n_valid_dev, None)
        # Griffin-Lim engines: latents + synth on device, vocode on
        # host per request (in the completion thread)
        res = self._sample_z(jnp.asarray(seeds), jnp.asarray(sigmas))
        if self._bf16:
            res = res.astype(jnp.bfloat16)
        if rep_dev is not None:
            # _sample_z lands on the default device; the synth params
            # are committed elsewhere — move the (small) latents over
            res = self.jax.device_put(res, rep_dev)
        mel_dev, attns, n_valid_dev = self._synth(
            params, res, jnp.asarray(sids),
            jnp.asarray(text_pad), jnp.asarray(in_lens), temp_arg)
        return ("gl", mel_dev, n_valid_dev, frames_cap)

    def _complete_batch(self, batch, handles):
        kind, data_dev, n_valid_dev, frames_cap = handles
        audio_all = mel = None
        if kind == "fused":
            audio_all = np.asarray(data_dev)
            n_valid = np.asarray(n_valid_dev)  # already frames_cap-capped
        elif kind == "staged":
            mel_dev, wgp, seeds_dev, strengths_dev = data_dev
            n_valid = np.asarray(n_valid_dev)  # blocks on the synth
            need = max(1, int(n_valid[:len(batch)].max()))
            Nb = next(b for b in self._vocode_buckets if b >= need)
            mel_b = mel_dev[:, :, :Nb] if Nb < mel_dev.shape[2] \
                else mel_dev
            audio_all = np.asarray(self._vocode_norm(wgp, mel_b,
                                                     n_valid_dev,
                                                     seeds_dev,
                                                     strengths_dev))
            with self._metrics_lock:
                self._metrics["staged_batches"] += 1
                self._metrics["vocode_bucket_hits"][Nb] += 1
        else:
            mel = np.asarray(data_dev, np.float32)
            # per-request n_frames: cap the emitted length (synthesis
            # runs the engine-fixed latent length; this trims output)
            n_valid = np.minimum(np.asarray(n_valid_dev), frames_cap)

        for b, (ids, sid, sigma, seed, nf, temp, _dstr, slot, done) in \
                enumerate(batch):
            n = max(1, int(n_valid[b]))
            if audio_all is not None:
                slot["wav"] = audio_all[b, :n * 256]
            else:
                audio = self._vocode(mel[b, :, :n])
                audio = audio / max(1e-8, np.abs(audio).max())
                slot["wav"] = (audio * 32767).astype(np.int16)
            done.set()
        with self._metrics_lock:
            self._metrics["audio_seconds"] += float(
                np.maximum(1, n_valid[:len(batch)]).sum() * 256
                / self.data_config["sampling_rate"])

    def _vocode(self, mel):
        """Griffin-Lim fallback for engines without a neural vocoder
        (those with one run the fused _synth_vocode dispatch)."""
        from flowtron_tpu.infer.sampling import mel_to_audio_griffinlim
        return mel_to_audio_griffinlim(mel, self.data_config, n_iters=20)

    # -- lifecycle --------------------------------------------------------
    def warmup(self):
        """Pre-compile the batch-path programs: one jit executable
        exists per (batch-bucket, text-bucket) pair — and per replica
        device — so without warmup the first request to hit each pair
        pays its compile (seconds on CPU; minutes on a cold TPU
        tunnel, though the persistent compile cache amortizes across
        restarts). Dispatches a tiny dummy batch through the real
        jitted entry points for every pair and blocks until each
        result is materialized. Warms the scalar-temperature variant
        (the common case; per-request temperature vectors trace their
        own program on first use)."""
        jnp = self.jnp
        Bs, B = [], 1
        while B <= self.max_batch:
            m = self._batch_mult
            Bs.append(((B + m - 1) // m) * m)
            B *= 2
        Bs = sorted(set(Bs))
        param_sets = [(self.params, self.wg[0] if self.wg else None,
                       None)]
        if self._replica_devices is not None:
            param_sets = [
                (self._replica_params[r],
                 self._replica_wg[r] if self._replica_wg is not None
                 else None,
                 self._replica_devices[r])
                for r in range(self._n_replicas)]
        n = 0
        t0 = time.time()
        for params, wgp, rep_dev in param_sets:
            for B in Bs:
                for Tk in self.text_buckets:
                    text = np.zeros((B, Tk), np.int64)
                    text[:, 0] = 1
                    seeds = jnp.asarray(np.zeros((B,), np.int64))
                    sigmas = jnp.asarray(np.full((B,), 0.5, np.float32))
                    temp = jnp.asarray(1.0, jnp.float32)
                    strengths = jnp.asarray(
                        np.full((B,), self._denoise, np.float32))
                    # (seeds, sigmas, sids, text, in_lens, temp, caps):
                    # the shared tail of both vocoder entry points,
                    # marshaled from numpy exactly like _dispatch_batch
                    tail = (seeds, sigmas,
                            jnp.asarray(np.zeros((B,), np.int64)),
                            jnp.asarray(text),
                            jnp.asarray(np.ones((B,), np.int64)),
                            temp,
                            jnp.asarray(np.full((B,), self.n_frames,
                                                np.int64)))
                    if self._synth_mel is not None:
                        mel, nv = self._synth_mel(params, *tail)
                        np.asarray(nv)
                        if Tk == self.text_buckets[0]:
                            # vocode programs key on (B, frame bucket),
                            # not the text bucket — warm once per B.
                            # Only sub-n_frames buckets: the auto rule
                            # sends full-length batches down the fused
                            # chain, so the full staged bucket is
                            # unreachable (forced-staged use recompiles
                            # it on demand).
                            for Nb in self._vocode_buckets[:-1]:
                                np.asarray(self._vocode_norm(
                                    wgp, mel[:, :, :Nb], nv, seeds,
                                    strengths))
                                n += 1
                    if self._synth_vocode is not None:
                        # with buckets on, the fused chain remains the
                        # full-length fallback — warm it as well
                        _, nv = self._synth_vocode(params, wgp, *tail,
                                                   strengths)
                        np.asarray(nv)
                        if self._synth_mel is not None:
                            n += 1
                    if self._synth_mel is None \
                            and self._synth_vocode is None:
                        res = self._sample_z(seeds, sigmas)
                        if self._bf16:
                            res = res.astype(jnp.bfloat16)
                        if rep_dev is not None:
                            res = self.jax.device_put(res, rep_dev)
                        # tail[2:5] = (sids, text, in_lens)
                        _, _, nv = self._synth(params, res, *tail[2:5],
                                               temp)
                        np.asarray(nv)
                    n += 1
        if self._mux is not None:
            # the mux compiles its tick/join/window programs on the
            # first stream — run one throwaway stream now. The stepper
            # thread owns step(); a warmup stream through the normal
            # open() path is stepped by it, so just drain the events.
            from flowtron_tpu.infer.multistream import MuxFull
            try:
                h, q = self._mux_open_routed(
                    self.jax.random.PRNGKey(0), 0,
                    np.ones((4,), np.int64), 0.5, None,
                    min(self.n_frames, 3 * self._mux.C))
                while True:
                    item = q.get(timeout=600)
                    if isinstance(item, Exception):
                        raise item
                    if item[1]:
                        break
                n += 1
            except (MuxFull, EngineOverloaded):
                pass   # real traffic already warming it
        return {"programs": n, "seconds": round(time.time() - t0, 2)}

    def shutdown(self, timeout=60.0):
        """Stop serving and release device memory (runtime model
        unload). New submit/stream calls raise immediately; requests
        already dispatched complete; active streams run to their end
        before their streamer pair is reclaimed. Safe to call twice
        (the second caller returns immediately, possibly before the
        first finishes tearing down)."""
        with self._lifecycle_lock:
            if self._closed:
                return
            self._closed = True
        # wake the dispatcher (it forwards the sentinel to the
        # completion thread). A full queue can't block us forever: new
        # submits are refused, so drain-and-fail until the put lands.
        while True:
            try:
                self._queue.put_nowait(_SHUTDOWN)
                break
            except queue.Full:
                try:
                    item = self._queue.get_nowait()
                except queue.Empty:
                    continue
                if item is not _SHUTDOWN:
                    self._fail_batch([item],
                                     RuntimeError("engine shut down"))
        self._worker.join(timeout)
        self._completer.join(timeout)
        # fail any requests that raced past the closed check after the
        # sentinel was consumed
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not _SHUTDOWN:
                self._fail_batch([item], RuntimeError("engine shut down"))
        # reclaim the streamer pairs: each active stream returns its
        # pair to the pool when it finishes (stream() already refuses
        # new checkouts via _closed)
        pool = self._stream_pool
        if pool is not None:
            deadline = time.time() + timeout
            got = 0
            while got < self._stream_workers and time.time() < deadline:
                try:
                    pool.get(timeout=0.2)
                    got += 1
                except queue.Empty:
                    pass
            self._stream_pool = None
        if self._mux is not None:
            # stop the stepper, then fail any consumers still waiting
            self._mux_wake.set()
            self._mux_thread.join(timeout)
            with self._mux_lock:
                routes, self._mux_routes = self._mux_routes, {}
            for q in routes.values():
                try:
                    q.put_nowait(RuntimeError("engine shut down"))
                except queue.Full:
                    pass
            self._mux = None
        # drop the device references (params, replica copies, vocoder
        # weights, jitted executables) so XLA can free the HBM
        self.params = None
        self._replica_params = self._replica_wg = None
        self.wg = None
        self._synth = self._synth_vocode = self._sample_z = None
        self._synth_mel = self._vocode_norm = None
        self._denoiser = None


def _wav_bytes(wav_int16, sr):
    from scipy.io import wavfile
    buf = io.BytesIO()
    wavfile.write(buf, sr, wav_int16)
    return buf.getvalue()


def _wav_stream_header(sr):
    """RIFF/WAVE header with unknown (0xFFFFFFFF) sizes — the standard
    convention for live PCM16 mono streams; players read to EOF."""
    import struct
    return (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt " +
            struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16) +
            b"data" + struct.pack("<I", 0xFFFFFFFF))


# -- minimal RFC 6455 WebSocket framing (stdlib only) -----------------------

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def _ws_accept_key(key):
    import base64
    import hashlib
    return base64.b64encode(
        hashlib.sha1((key + _WS_GUID).encode()).digest()).decode()


def _ws_send(wfile, payload, opcode):
    """One unmasked server->client frame (FIN set). opcode: 1 text,
    2 binary, 8 close."""
    import struct
    head = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        head += bytes([n])
    elif n < 1 << 16:
        head += bytes([126]) + struct.pack(">H", n)
    else:
        head += bytes([127]) + struct.pack(">Q", n)
    wfile.write(head + payload)
    wfile.flush()


_WS_MAX_FRAME = 1 << 20  # the only inbound payload is a small JSON body
_HTTP_MAX_BODY = 1 << 20  # same bound for plain-HTTP request bodies


class _BodyTooLarge(Exception):
    def __init__(self, length):
        super().__init__(f"request body {length} bytes exceeds "
                         f"{_HTTP_MAX_BODY}")


def _ws_recv(rfile):
    """One client->server frame -> (opcode, payload). Client frames are
    masked per RFC 6455; unmask. Returns (None, b'') on EOF or on a
    frame larger than _WS_MAX_FRAME (a client-supplied 64-bit length
    must not drive an unbounded read/allocation)."""
    import struct
    h = rfile.read(2)
    if len(h) < 2:
        return None, b""
    opcode = h[0] & 0x0F
    masked = h[1] & 0x80
    n = h[1] & 0x7F
    if n == 126:
        n = struct.unpack(">H", rfile.read(2))[0]
    elif n == 127:
        n = struct.unpack(">Q", rfile.read(8))[0]
    if n > _WS_MAX_FRAME:
        return None, b""
    mask = rfile.read(4) if masked else b"\x00" * 4
    data = rfile.read(n)
    if masked:
        data = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
    return opcode, data


def make_handler(engine, loader=None):
    """HTTP handler over one engine or a {name: engine} dict.

    Multi-model serving (beyond the reference, which ships two published
    checkpoints — LJS and LibriTTS — that a deployment wants resident at
    once): requests pick a voice with a "model" field; the first dict
    entry is the default. GET /models lists them. Single-engine response
    shapes (/healthz, /metrics) are unchanged.

    Runtime model management: when `loader(config_path, ckpt, vocoder)
    -> SynthesisEngine` is given, `POST /models` with
    {"name", "config", "checkpoint", "vocoder"?} loads a new voice
    without a restart, and `DELETE /models/<name>` shuts its engine
    down and frees its device memory. The last resident model cannot be
    unloaded; unloading the default promotes the next loaded model."""
    from http.server import BaseHTTPRequestHandler

    # NOT copied: runtime loads/unloads mutate the caller's dict, so
    # main()'s exit path shuts down runtime-loaded engines too
    engines = engine if isinstance(engine, dict) else {"default": engine}
    if not engines:
        raise ValueError("no models given")
    reg_lock = threading.Lock()
    reg = {"default": next(iter(engines)), "loading": set()}
    profile_lock = threading.Lock()  # one trace capture at a time

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # chunked transfer for /stream

        def log_message(self, fmt, *args):  # quiet
            pass

        def _engine(self, req):
            with reg_lock:
                name = req.get("model") or reg["default"]
                if name not in engines:
                    raise UnknownModel(name, set(engines))
                return engines[name]

        def _read_json_body(self):
            """Bounded request-body read: a client-declared
            Content-Length above _HTTP_MAX_BODY is rejected BEFORE any
            read/allocation (mirrors the _WS_MAX_FRAME discipline —
            text requests are <=128-id buckets, so 1 MB is generous)."""
            length = int(self.headers.get("Content-Length", 0))
            if length > _HTTP_MAX_BODY:
                raise _BodyTooLarge(length)
            return json.loads(self.rfile.read(length) or b"{}")

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            with reg_lock:
                snap = dict(engines)
                default_name = reg["default"]
            # keyed-by-model shapes only when actually multi-model, so
            # a plain single-model deployment keeps the flat /metrics
            # and /healthz responses regardless of loader availability
            multi = len(snap) > 1
            if self.path == "/healthz":
                depths = {n: e.queue_depth for n, e in snap.items()}
                out = {"status": "ok", "queue_depth": sum(depths.values())}
                if multi:
                    out["models"] = depths
                self._json(200, out)
            elif self.path == "/metrics":
                self._json(200, {n: e.metrics()
                                 for n, e in snap.items()} if multi
                           else snap[default_name].metrics())
            elif self.path == "/models":
                self._json(200, {
                    "default": default_name,
                    "models": [{
                        "name": n,
                        "can_stream": e.can_stream,
                        "sampling_rate": e.data_config["sampling_rate"],
                        "n_speakers": e.config["model_config"]
                        .get("n_speakers"),
                        # dataset speaker ids valid in "speaker_id"
                        # (dense model indices are looked up for you)
                        "speaker_ids": sorted(
                            int(s) for s in e.frontend.speaker_ids),
                    } for n, e in snap.items()]})
            elif self.path == "/stream-ws":
                self._do_stream_ws()
            elif self.path == "/":
                # discovery index: what this server speaks
                from flowtron_tpu import __version__
                self._json(200, {
                    "service": "flowtron_tpu",
                    "version": __version__,
                    "endpoints": {
                        "POST /synthesize": "full wav (json request)",
                        "POST /stream": "chunked-transfer wav",
                        "GET /stream-ws": "WebSocket: json in, "
                                          "pcm16 frames out",
                        "GET /models": "resident voices + speaker ids",
                        "POST /models": "load a voice at runtime",
                        "DELETE /models/<name>": "drain + unload",
                        "GET /metrics": "counters + latency percentiles",
                        "GET /healthz": "liveness + queue depth",
                        "POST /profile": "capture a device trace",
                    },
                    "request_fields": [
                        "text", "speaker_id", "sigma", "seed",
                        "n_frames", "temperature", "split", "denoise",
                        "model"],
                })
            else:
                self._json(404, {"error": "not found"})

        def _do_profile(self, req):
            """POST /profile: capture a jax.profiler device trace for
            `seconds` (clamped to 60) under whatever traffic is live,
            writing TensorBoard-readable files under `dir` (a fresh
            temp dir when omitted). Returns the directory; fetch it
            with TensorBoard's profile plugin. 409 when a capture is
            already running."""
            import tempfile
            try:
                seconds = min(60.0, max(0.05,
                                        float(req.get("seconds", 1.0))))
            except (TypeError, ValueError):
                self._json(400, {"error": "seconds must be a number"})
                return
            trace_dir = req.get("dir") or tempfile.mkdtemp(
                prefix="flowtron-trace-")
            if not profile_lock.acquire(blocking=False):
                self._json(409, {"error": "a profile capture is "
                                 "already running"})
                return
            try:
                import jax
                jax.profiler.start_trace(trace_dir)
                time.sleep(seconds)
                jax.profiler.stop_trace()
            except Exception as e:
                self._json(500, {"error": repr(e)})
                return
            finally:
                profile_lock.release()
            self._json(200, {"trace_dir": trace_dir,
                             "seconds": seconds})

        def do_DELETE(self):
            """DELETE /models/<name>: shut the engine down (drains its
            queue, finishes active streams, frees device memory) and
            remove the voice. 409 for the last resident model."""
            if not self.path.startswith("/models/"):
                self._json(404, {"error": "not found"})
                return
            name = self.path[len("/models/"):]
            # decide under the lock, write the response outside it — a
            # slow client socket must not block all registry operations
            eng = err = None
            with reg_lock:
                if name not in engines:
                    err = (404, {"error": f"unknown model {name!r}"})
                elif len(engines) == 1:
                    err = (409, {"error": "cannot unload the last "
                                 "resident model"})
                else:
                    eng = engines.pop(name)
                    if reg["default"] == name:
                        reg["default"] = next(iter(engines))
                    new_default = reg["default"]
            if err is not None:
                self._json(*err)
                return
            eng.shutdown()
            self._json(200, {"unloaded": name, "default": new_default})

        def _do_load_model(self, req):
            """POST /models: load a new voice at runtime. Builds the
            engine OUTSIDE the registry lock (checkpoint restore +
            tracing take seconds); a per-name loading set keeps
            concurrent loads of the same name to one winner (409)."""
            if loader is None:
                self._json(501, {"error": "runtime model loading is "
                                 "not enabled (start via the serve "
                                 "CLI, or pass make_handler a loader)"})
                return
            try:
                name = req["name"]
                config_path = req["config"]
                ckpt = req["checkpoint"]
            except KeyError as e:
                self._json(400, {"error": f"missing field {e}"})
                return
            with reg_lock:
                taken = name in engines or name in reg["loading"]
                if not taken:
                    reg["loading"].add(name)
            if taken:  # respond outside the lock
                self._json(409, {"error": f"model {name!r} is "
                                 "already loaded (or loading)"})
                return
            try:
                eng = loader(config_path, ckpt, req.get("vocoder", ""))
            except Exception as e:
                with reg_lock:
                    reg["loading"].discard(name)
                self._json(500, {"error": repr(e)})
                return
            # discard + insert atomically: a gap between them would let
            # a concurrent load of the same name win the slot and leak
            # this engine's threads and device memory
            with reg_lock:
                reg["loading"].discard(name)
                engines[name] = eng
            self._json(200, {"loaded": name,
                             "can_stream": eng.can_stream})

        def _do_stream_ws(self):
            """WebSocket streaming transport (RFC 6455, stdlib framing):
            client upgrades, sends ONE text frame with the /stream JSON
            body, receives a text frame {"sample_rate", "format"}, then
            binary frames of raw PCM16 mono, then a close frame. Errors
            arrive as a text frame {"error": ...} before close — framed
            and typed, unlike chunked WAV where an early disconnect is
            the only error signal."""
            key = self.headers.get("Sec-WebSocket-Key")
            if self.headers.get("Upgrade", "").lower() != "websocket" \
                    or not key:
                self._json(400, {"error": "expected websocket upgrade"})
                return
            with reg_lock:
                streamable = any(e.can_stream for e in engines.values())
            if not streamable:
                self._json(501, {"error": "streaming requires a "
                                 "neural vocoder (-w)"})
                return
            self.send_response(101, "Switching Protocols")
            self.send_header("Upgrade", "websocket")
            self.send_header("Connection", "Upgrade")
            self.send_header("Sec-WebSocket-Accept", _ws_accept_key(key))
            self.end_headers()
            self.close_connection = True

            def text(obj):
                _ws_send(self.wfile, json.dumps(obj).encode(), 1)

            gen = None
            try:
                opcode, payload = _ws_recv(self.rfile)
                if opcode != 1:  # expected one text frame with the req
                    text({"error": "expected a text frame with the "
                          "request JSON"})
                    _ws_send(self.wfile, b"\x03\xe8", 8)
                    return
                req = json.loads(payload or b"{}")
                eng = self._engine(req)
                if not eng.can_stream:
                    text({"error": "streaming requires a neural "
                          "vocoder (-w) on this model"})
                    _ws_send(self.wfile, b"\x03\xe8", 8)
                    return
                gen = eng.stream(
                    req["text"], req.get("speaker_id", 0),
                    req.get("sigma", 0.5), req.get("seed", 1234),
                    n_frames=req.get("n_frames"),
                    temperature=req.get("temperature"),
                    split=bool(req.get("split", False)),
                    denoise=req.get("denoise"))
                sr = eng.data_config["sampling_rate"]
                text({"sample_rate": sr, "format": "pcm16"})
                for pcm in gen:
                    if len(pcm):
                        _ws_send(self.wfile, pcm.tobytes(), 2)
                _ws_send(self.wfile, b"\x03\xe8", 8)  # close 1000
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away mid-stream
            except KeyError as e:
                text({"error": f"missing field {e}"})
                _ws_send(self.wfile, b"\x03\xe8", 8)
            except Exception as e:
                try:
                    text({"error": str(e)})
                    _ws_send(self.wfile, b"\x03\xe8", 8)
                except OSError:
                    pass
            finally:
                if gen is not None:
                    gen.close()  # release the streamers

        def do_POST(self):
            if self.path == "/stream":
                self._do_stream()
                return
            if self.path in ("/models", "/profile"):
                try:
                    req = self._read_json_body()
                except _BodyTooLarge as e:
                    self._json(413, {"error": str(e)})
                    return
                except Exception as e:
                    self._json(400, {"error": repr(e)})
                    return
                if self.path == "/models":
                    self._do_load_model(req)
                else:
                    self._do_profile(req)
                return
            if self.path != "/synthesize":
                self._json(404, {"error": "not found"})
                return
            try:
                req = self._read_json_body()
                text = req["text"]
                wav, sr = self._engine(req).submit(
                    text, req.get("speaker_id", 0),
                    req.get("sigma", 0.5), req.get("seed", 1234),
                    n_frames=req.get("n_frames"),
                    temperature=req.get("temperature"),
                    split=bool(req.get("split", False)),
                    denoise=req.get("denoise"))
                body = _wav_bytes(wav, sr)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except KeyError as e:
                self._json(400, {"error": f"missing field {e}"})
            except UnknownModel as e:
                self._json(404, {"error": str(e)})
            except (TextTooLong, _BodyTooLarge) as e:
                self._json(413, {"error": str(e)})
            except EngineOverloaded as e:
                self._json(429, {"error": str(e)})
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:
                self._json(500, {"error": repr(e)})

        def _do_stream(self):
            """Chunked-transfer WAV: audio bytes flow as synthesis runs
            (one mel chunk + vocoder lookahead to first byte)."""
            try:
                req = self._read_json_body()
                eng = self._engine(req)
                if not eng.can_stream:
                    self._json(501, {"error": "streaming requires a "
                                     "neural vocoder (-w)"})
                    return
                gen = eng.stream(
                    req["text"], req.get("speaker_id", 0),
                    req.get("sigma", 0.5), req.get("seed", 1234),
                    n_frames=req.get("n_frames"),
                    temperature=req.get("temperature"),
                    split=bool(req.get("split", False)),
                    denoise=req.get("denoise"))
            except KeyError as e:
                self._json(400, {"error": f"missing field {e}"})
                return
            except UnknownModel as e:
                self._json(404, {"error": str(e)})
                return
            except (TextTooLong, _BodyTooLarge) as e:
                self._json(413, {"error": str(e)})
                return
            except EngineOverloaded as e:
                self._json(429, {"error": str(e)})
                return
            except ValueError as e:  # request validation (empty text,
                self._json(400, {"error": str(e)})  # denoise w/o -d, ..)
                return
            except Exception as e:
                self._json(500, {"error": repr(e)})
                return
            sr = eng.data_config["sampling_rate"]
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def write_chunk(b):
                self.wfile.write(f"{len(b):X}\r\n".encode() + b + b"\r\n")

            try:
                write_chunk(_wav_stream_header(sr))
                for pcm in gen:
                    if len(pcm):
                        write_chunk(pcm.tobytes())
                self.wfile.write(b"0\r\n\r\n")
            finally:
                gen.close()  # client disconnect: release the streamers

    return Handler


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


if __name__ == "__main__":
    main()
