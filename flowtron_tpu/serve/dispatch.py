"""SynthesisEngine's micro-batching side: the dispatcher/completion
thread pair and the three dispatch strategies (fused one-shot chain,
two-stage gate-aware vocoding, Griffin-Lim host fallback). Mixed into
SynthesisEngine (engine.py)."""

import queue
import time

import numpy as np

from flowtron_tpu.serve.common import _SHUTDOWN


class DispatchMixin:
    """The batching worker pipeline (see _loop/_complete_loop)."""

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
