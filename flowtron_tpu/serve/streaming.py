"""SynthesisEngine's streaming side: the per-stream worker-pool path
and the batched multi-stream mux path (--stream-mux). Mixed into
SynthesisEngine (engine.py); every method runs against engine state."""

import queue
import threading
import time

import numpy as np

from flowtron_tpu.serve.common import (EngineOverloaded, TextTooLong,
                                       _log, split_measured)


class StreamPathMixin:
    """stream() and its two backends: checked-out streamer pairs from a
    warm pool, or routed slots on the shared batched multiplexer."""

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
                    _log.debug("stream end sentinel dropped (consumer "
                               "stalled; liveness check ends it)")

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
                # a failing tick poisons every active stream: close
                # every routed slot (lanes free at the next tick
                # instead of leaking until restart), surface the error
                # to all consumers, and back off before retrying — a
                # persistently failing step() must not busy-spin
                with self._mux_lock:
                    routes, self._mux_routes = self._mux_routes, {}
                for h, q in routes.items():
                    try:
                        mux.close(h)
                    except Exception:
                        _log.debug("mux close(%s) failed during tick-"
                                   "failure teardown", h, exc_info=True)
                    try:
                        q.put_nowait(e)
                    except queue.Full:
                        _log.debug("mux route %s full; error sentinel "
                                   "dropped", h)
                time.sleep(0.1)
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
                    # the consumer stalled long enough to fill a
                    # whole-utterance queue (dead client). Free a tail
                    # slot and enqueue an error sentinel so a consumer
                    # that IS still draining terminates promptly
                    # instead of blocking out its stall timeout
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        pass
                    try:
                        q.put_nowait(RuntimeError(
                            "stream aborted: consumer stalled"))
                    except queue.Full:
                        _log.debug("mux stall sentinel dropped "
                                   "(route %s still full)", h)
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
                        try:
                            item = q.get(
                                timeout=self.stream_stall_timeout + 60)
                        except queue.Empty:
                            # stepper died or dropped this route
                            # without a sentinel: end the stream
                            # (chunked-transfer callers see EOF) rather
                            # than raising queue.Empty through the
                            # half-written HTTP response
                            _log.debug("mux consumer timed out waiting "
                                       "for events; ending stream")
                            return
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
