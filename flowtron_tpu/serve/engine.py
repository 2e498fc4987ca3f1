"""The serving engine: warm jitted synthesis programs at fixed shape
buckets plus the request queue that micro-batches concurrent requests
into one device dispatch (see the package docstring for the protocol).

The class is assembled from three files to keep each maintainable:
this one owns construction (program building, replica/mesh placement,
the worker threads) and lifecycle (submit/metrics/warmup/shutdown);
streaming.py owns the stream paths; dispatch.py owns the batch
dispatch/completion pipeline."""

import queue
import threading
import time

import numpy as np

from flowtron_tpu.serve.common import (EngineOverloaded, TextTooLong,
                                       _SHUTDOWN, _log, split_measured)
from flowtron_tpu.serve.dispatch import DispatchMixin
from flowtron_tpu.serve.streaming import StreamPathMixin


class SynthesisEngine(StreamPathMixin, DispatchMixin):
    """Batched synthesis over fixed shape buckets (one jit program per
    (batch, text) bucket; requests are padded up)."""

    def __init__(self, config, flowtron_path, waveglow_path="",
                 max_batch=8, batch_timeout_ms=20.0, text_buckets=(64, 128),
                 n_frames=400, int8=False, quantize="", fused=False,
                 mesh_shape=None, bf16=False, max_queue=64,
                 stream_stall_timeout=30.0, stream_workers=2,
                 stream_acquire_timeout=5.0, replicas=1,
                 vocode_buckets=None, denoise=0.0, stream_mux=0,
                 mux_joins_per_tick=0):
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
                gate_threshold=0.5,
                max_joins_per_tick=(int(mux_joins_per_tick)
                                    if int(mux_joins_per_tick) > 0
                                    else None))
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
                    _log.debug("shutdown sentinel dropped on a full "
                               "mux route")
            self._mux = None
        # drop the device references (params, replica copies, vocoder
        # weights, jitted executables) so XLA can free the HBM
        self.params = None
        self._replica_params = self._replica_wg = None
        self.wg = None
        self._synth = self._synth_vocode = self._sample_z = None
        self._synth_mel = self._vocode_norm = None
        self._denoiser = None
