"""Streaming synthesis: incremental mel + vocoder chunks.

The reference synthesizes a full utterance before any audio exists
(reference:inference.py:40-132 runs the whole frame loop, then the whole
vocoder). For serving, time-to-first-audio matters more than total
throughput. This module streams both stages under TPU constraints
(fixed shapes, jit-once, no data-dependent Python in the compiled path):

- **Mel stage** (`StreamingMelSynthesizer`): the AR inverse scan is
  causal, so it chunks exactly — run `chunk_frames` steps per dispatch
  with the scan carry (LSTM/attention state) threaded between calls
  (models/ar_step.py `carry`/`return_carry`).

  * n_flows == 1: fully incremental — latents are sampled per chunk and
    gate termination is tracked on host across chunks, same first-hit
    semantics as the offline path.
  * n_flows >= 2 (the flagship config): two-stage. The reference's
    inference runs the flows in REVERSE, so the gated last flow — a
    backward flow in the alternating layout, which consumes the whole
    utterance by construction — runs first. Stage 1 therefore runs
    flows n-1..1 offline in one dispatch (cheap: one fused scan pass,
    ~51 ms for 4.6 s of audio at flagship dims on v5e), yielding the
    intermediate latents plus the per-stream gate n_valid. Stage 2
    streams the remaining FORWARD flow 0 (always forward: even index)
    chunk by chunk with carried state — exactly the offline scan,
    prefix by prefix. Time-to-first-audio is stage 1 + one chunk +
    vocoder lookahead instead of the whole utterance.

  Frames at or past a stream's own gate n_valid are masked to silence
  before being yielded (streamed audio cannot be retracted; offline
  callers trim at n_valid after the fact).

- **Vocoder stage** (`StreamingVocoder`): WaveGlow is convolutional,
  not causal, so chunking uses a sliding fixed-width window with
  `context` mel frames of history and `lookahead` frames of delay;
  only the interior span is emitted. Latents come from a
  position-keyed generator (`positional_z`: one `jax.random.fold_in`
  per absolute squeezed frame), so overlapping windows see identical
  z and the emitted stream is window-invariant. The truncation error
  from the finite window decays geometrically with context/lookahead
  (WN receptive field per flow is 255 squeezed frames each side;
  influence through 12 stacked flows decays much faster than its
  formal support) — tests pin the deviation vs the offline pass.

- `stream_tts` glues both into a generator of waveform chunks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flowtron_tpu.models.ar_step import (
    ar_step_infer, ar_back_step_infer,
)
from flowtron_tpu.models.flowtron import _encode_text
from flowtron_tpu.utils.masks import sequence_mask
from flowtron_tpu.vocoder.waveglow import (
    waveglow_infer_z, waveglow_n_remaining,
)

HOP = 256  # audio samples per mel frame (data_config.hop_length)
# log-mel silence (the dynamic-range clamp floor, log(1e-5)): what a
# trimmed/post-gate frame vocodes to
SILENCE = float(np.log(1e-5))


class StreamingMelSynthesizer:
    """Chunked AR mel synthesis with carried scan state.

    Usage:
        s = StreamingMelSynthesizer(params, config, chunk_frames=40)
        for mel_chunk in s.stream(key, speaker_ids, text, sigma=0.5):
            ...  # (B, n_mel, chunk_frames), final chunk may be partial
        s.n_valid  # (B,) total valid frames, gate semantics == offline

    Works for any n_flows: forward-only models stream fully
    incrementally; multi-flow models run a one-dispatch offline prelude
    over flows n-1..1 (which includes the gated backward flow) and then
    stream the remaining forward flow 0 (see module docstring).
    """

    def __init__(self, params, config, chunk_frames=40, temperature=1.0,
                 gate_threshold=0.5, max_frames=2000, fused=False):
        """fused: route the offline prelude flows (n_flows >= 2) through
        the VMEM-resident Pallas decoder kernel — the B=1 latency path
        (~1.7x on the prelude dispatch); the chunked flow-0 scan keeps
        its carry and cannot fuse. TPU only (interpret mode elsewhere);
        per-flow fallback to lax.scan where unsupported."""
        self.params = params
        self.config = config
        self.n_flows = int(config["n_flows"])
        self.chunk_frames = int(chunk_frames)
        self.temperature = float(temperature)
        self.gate_threshold = float(gate_threshold)
        self.max_frames = int(max_frames)
        self.fused = fused
        self.n_valid = None

        flow0 = params["flows"][0]
        # n_flows==1: the (only) flow carries the gate; n_flows>=2: the
        # gate lives on the last flow, evaluated inside the prelude
        self._gate_in_stream = self.n_flows == 1 and "gate_layer" in flow0
        # sample latents in the params' dtype (bf16 serving engines would
        # otherwise promote every op back to fp32)
        from flowtron_tpu.utils.weights import resolve_weight
        self._dtype = resolve_weight(flow0["conv"]["w"]).dtype

        def encode(p, sids, text, key_mask):
            return _encode_text(p, config, sids, text, key_mask)

        def chunk_step(p, z_chunk, enc, key_mask, carry, temperature):
            return ar_step_infer(
                p["flows"][0], z_chunk, enc, key_mask=key_mask,
                temperature=temperature, carry=carry,
                return_carry=True)

        self._encode = jax.jit(encode)
        self._chunk = jax.jit(chunk_step)

        self._prelude = None
        if self.n_flows > 1:
            n_flows = self.n_flows
            gate_thr = self.gate_threshold
            fused_mode = self.fused

            def prelude(p, residual, enc, key_mask, temperature):
                """Flows n-1..1 of the reversed inference chain in one
                dispatch (reference:flowtron.py:924-929 minus the last
                inverse step). Returns (z for flow 0, n_valid)."""
                z = residual
                n_valid = None
                for rev_i, flow_params in enumerate(
                        reversed(p["flows"][1:])):
                    i = n_flows - 1 - rev_i
                    step = ar_step_infer if i % 2 == 0 else \
                        ar_back_step_infer
                    z, _, n_valid = step(
                        flow_params, z, enc, key_mask, None,
                        temperature, gate_thr, n_valid=n_valid,
                        fused=fused_mode)
                if n_valid is None:
                    n_valid = jnp.full((z.shape[1],), z.shape[0],
                                       jnp.int32)
                return z, n_valid

            self._prelude = jax.jit(prelude)

    def stream(self, key, speaker_ids, text, sigma=0.5, in_lens=None,
               residual=None, temperature=None, max_frames=None):
        """Generator of (B, n_mel, <=chunk_frames) mel chunks.

        For n_flows==1, z is sampled per chunk via fold_in(key,
        chunk_index) unless a full `residual` (B, n_mel, N) is supplied
        (testing / style-transfer), in which case chunks are sliced from
        it. For n_flows>=2 the full residual is sampled (or taken) up
        front and pushed through the offline prelude first.

        temperature / max_frames override the constructor defaults per
        call without recompiling (temperature is a traced scalar; for
        multi-flow models max_frames caps the emitted length against the
        fixed prelude shape — an output-length cap, not a change of the
        latent length the backward flow sees).

        After exhaustion, `self.n_valid` holds per-stream valid frame
        counts (first gate hit, inclusive — offline semantics). Frames
        past a stream's own n_valid within yielded chunks are silence.
        """
        temp = jnp.asarray(
            self.temperature if temperature is None else float(temperature),
            jnp.float32)
        key_mask = None
        if in_lens is not None:
            key_mask = sequence_mask(in_lens, text.shape[1])
        enc = self._encode(self.params, speaker_ids, text, key_mask) \
            if key_mask is not None else \
            self._encode(self.params, speaker_ids, text, None)

        if self.n_flows == 1:
            yield from self._stream_incremental(
                key, enc, key_mask, speaker_ids.shape[0], sigma, residual,
                temp, max_frames)
        else:
            yield from self._stream_two_stage(
                key, enc, key_mask, speaker_ids.shape[0], sigma, residual,
                temp, max_frames)

    # -- n_flows == 1: fully incremental ---------------------------------
    def _stream_incremental(self, key, enc, key_mask, B, sigma, residual,
                            temp, max_frames_arg):
        n_mel = self.config["n_mel_channels"]
        C = self.chunk_frames
        cap = self.max_frames if max_frames_arg is None \
            else min(int(max_frames_arg), self.max_frames)

        if residual is not None:
            max_frames = min(residual.shape[2], cap)
            res_tbm = jnp.transpose(residual, (2, 0, 1))  # (N, B, n_mel)
        else:
            max_frames = cap

        carry = None
        fired = np.zeros((B,), bool)
        n_valid = np.full((B,), 0, np.int64)
        done_at = None
        c = 0
        while c * C < max_frames:
            if residual is not None:
                z_c = res_tbm[c * C:(c + 1) * C]
                if z_c.shape[0] < C:  # pad the tail to the fixed shape
                    pad = C - z_c.shape[0]
                    z_c = jnp.concatenate(
                        [z_c, jnp.zeros((pad,) + z_c.shape[1:],
                                        z_c.dtype)], 0)
            else:
                z_c = sigma * jax.random.normal(
                    jax.random.fold_in(key, c), (C, B, n_mel),
                    self._dtype)
            n_real = min(C, max_frames - c * C)
            mel_c, _attn, gates_c, carry = self._chunk(
                self.params, z_c, enc, key_mask, carry, temp)

            if self._gate_in_stream:
                g = np.asarray(gates_c, np.float32)[:n_real]  # (n, B)
                hit = g > self.gate_threshold
                for b in range(B):
                    if not fired[b] and hit[:, b].any():
                        fired[b] = True
                        n_valid[b] = c * C + int(hit[:, b].argmax()) + 1
            if self._gate_in_stream and fired.all():
                done_at = int(n_valid.max())
                # trim this chunk to the utterance end: frames past the
                # last gate hit must never reach the vocoder — streamed
                # audio cannot be retracted (offline callers cut at
                # n_valid after the fact; a stream has no "after")
                n_real = min(n_real, done_at - c * C)

            if n_real > 0:
                mel_y = mel_c[:n_real]
                if self._gate_in_stream and fired.any():
                    # per-stream exactness: a fired stream's frames past
                    # its OWN n_valid become silence, not the scan's
                    # meaningless continuation (they are already
                    # computed; only their content is replaced)
                    mel_y = _mask_past_valid(mel_y, c * C, n_valid, fired)
                yield jnp.transpose(mel_y, (1, 2, 0))
            c += 1
            if done_at is not None and c * C >= done_at:
                break

        total = min(c * C, max_frames)
        n_valid[~fired] = total
        self.n_valid = n_valid.copy()

    # -- n_flows >= 2: offline prelude + streamed forward flow -----------
    def _stream_two_stage(self, key, enc, key_mask, B, sigma, residual,
                          temp, max_frames_arg):
        n_mel = self.config["n_mel_channels"]
        C = self.chunk_frames
        if residual is None:
            residual = sigma * jax.random.normal(
                key, (B, n_mel, self.max_frames), self._dtype)
        z_tbm = jnp.transpose(residual, (2, 0, 1))  # (N, B, n_mel)
        N = z_tbm.shape[0]

        z1, n_valid = self._prelude(self.params, z_tbm, enc, key_mask,
                                    temp)
        nv = np.asarray(n_valid, np.int64)
        if max_frames_arg is not None:
            nv = np.minimum(nv, int(max_frames_arg))
        self.n_valid = nv.copy()
        done_at = max(1, int(nv.max()))

        carry = None
        c = 0
        while c * C < done_at:
            z_c = z1[c * C:(c + 1) * C]
            if z_c.shape[0] < C:
                pad = C - z_c.shape[0]
                z_c = jnp.concatenate(
                    [z_c, jnp.zeros((pad,) + z_c.shape[1:], z_c.dtype)], 0)
            mel_c, _attn, _gates, carry = self._chunk(
                self.params, z_c, enc, key_mask, carry, temp)
            n_real = min(C, done_at - c * C, N - c * C)
            if n_real > 0:
                mel_y = _mask_past_valid(mel_c[:n_real], c * C, nv,
                                         np.ones((B,), bool))
                yield jnp.transpose(mel_y, (1, 2, 0))
            c += 1


def _mask_past_valid(mel_nbm, c0, n_valid, active):
    """Silence frames at global positions >= their stream's n_valid.

    mel_nbm: (n, B, M); c0: first global frame index of this chunk;
    n_valid: (B,) host ints; active: (B,) host bools — streams whose
    n_valid is final (unfired streams keep their frames).
    """
    n = mel_nbm.shape[0]
    pos = c0 + np.arange(n)
    past = active[None, :] & (pos[:, None] >= np.asarray(n_valid)[None, :])
    if not past.any():
        return mel_nbm
    return jnp.where(jnp.asarray(past)[:, :, None],
                     jnp.asarray(SILENCE, mel_nbm.dtype), mel_nbm)


def positional_z(key, config, B, start, length, sigma, dtype=jnp.float32):
    """Latents for absolute squeezed-frame positions [start, start+length).

    One fold_in per position makes z a pure function of position, so any
    two windows agree on their overlap. `length` must be static under
    jit; `start` may be traced. Returns (z_main, z_early) in
    waveglow_infer_z's layout.
    """
    n_flows = config["n_flows"]
    k_main, *k_early = jax.random.split(key, 1 + n_flows)
    pos = start + jnp.arange(length)

    def draw(k, n_ch):
        zs = jax.vmap(
            lambda p: jax.random.normal(jax.random.fold_in(k, p),
                                        (B, n_ch), dtype))(pos)
        return sigma * jnp.transpose(zs, (1, 2, 0))  # (B, n_ch, T)

    z_main = draw(k_main, waveglow_n_remaining(config))
    z_early = [
        draw(k_early[f], config["n_early_size"])
        if (f % config["n_early_every"] == 0 and f > 0) else None
        for f in range(n_flows)]
    return z_main, z_early


class StreamingVocoder:
    """Sliding-window WaveGlow: push mel chunks, get waveform chunks.

    Emits audio for mel span [emitted, emitted+n) only once `lookahead`
    frames of future mel exist (or flush() is called); each window also
    carries `context` frames of history. Window edges are clamped to the
    true sequence ends, so boundary zero-padding matches the offline
    pass exactly; interior truncation error is bounded by the tests.
    """

    def __init__(self, wg_params, wg_config, key, sigma=0.8,
                 context=24, lookahead=16, impl="nch",
                 dtype=jnp.float32):
        self.params = wg_params
        self.config = wg_config
        self.key = key
        self.sigma = float(sigma)
        self.context = int(context)
        self.lookahead = int(lookahead)
        self.sq_per_frame = HOP // wg_config["n_group"]
        self._mel = None        # (B, n_mel, F) host-side buffer
        self._emitted = 0
        self._dtype = dtype

        def window_audio(p, mel_win, w0_frames, k):
            B = mel_win.shape[0]
            Tg = mel_win.shape[2] * self.sq_per_frame
            s = w0_frames * self.sq_per_frame
            z_main, z_early = positional_z(
                k, wg_config, B, s, Tg, self.sigma, dtype)
            return waveglow_infer_z(p, wg_config, mel_win, z_main,
                                    z_early, impl=impl)

        self._window_audio = jax.jit(window_audio)

    def reset(self, key=None):
        """Start a new utterance (optionally with a new latent key),
        keeping the compiled window function warm across requests."""
        self._mel = None
        self._emitted = 0
        if key is not None:
            self.key = key

    def push(self, mel_chunk):
        """Append (B, n_mel, n) mel frames; return ready audio
        (B, m*HOP) — possibly zero-length while lookahead fills."""
        mel_chunk = np.asarray(jax.device_get(mel_chunk))
        self._mel = mel_chunk if self._mel is None else \
            np.concatenate([self._mel, mel_chunk], axis=2)
        F = self._mel.shape[2]
        ready = F - self.lookahead - self._emitted
        if ready <= 0:
            return np.zeros((self._mel.shape[0], 0), np.float32)
        return self._emit(ready, F)

    def flush(self):
        """Emit everything remaining (end of utterance)."""
        if self._mel is None:
            return np.zeros((1, 0), np.float32)
        F = self._mel.shape[2]
        ready = F - self._emitted
        if ready <= 0:
            return np.zeros((self._mel.shape[0], 0), np.float32)
        return self._emit(ready, F, at_end=True)

    def _emit(self, n, F, at_end=False):
        e0 = self._emitted
        w0, w1 = window_spec(e0, n, F, self.context, self.lookahead,
                             at_end)
        mel_win = jnp.asarray(self._mel[:, :, w0:w1], self._dtype)
        audio = self._window_audio(self.params, mel_win, w0, self.key)
        lo = (e0 - w0) * HOP
        out = np.asarray(jax.device_get(audio))[:, lo:lo + n * HOP]
        self._emitted = e0 + n
        return out.astype(np.float32)


def window_spec(e0, n, F, context, lookahead, at_end=False):
    """The sliding-window arithmetic shared by StreamingVocoder and the
    batched multiplexer (infer/multistream.py): given `e0` frames already
    emitted, `n` to emit now and `F` frames buffered, return the mel
    window [w0, w1) to vocode. Widths are bucketed to multiples of 16 by
    extending LEFT into real history (exact semantics — just more
    context), so ragged tails reuse a few compiled shapes. Keeping this
    in one place guarantees the B=1 and batched paths compute identical
    windows (the multiplexer's per-stream-equality tests rely on it)."""
    W = context + n + lookahead
    w0 = max(0, e0 - context)
    if not at_end:
        w0 = min(w0, max(0, F - W))
        w1 = min(F, w0 + W)
    else:
        w1 = F
        w0 = max(0, w1 - W)
    bucket = -(-(w1 - w0) // 16) * 16
    w0 = max(0, w1 - bucket)
    return w0, w1


def pump_stream(mel_s, voc, key, speaker_ids, text, sigma=0.5,
                in_lens=None, temperature=None, max_frames=None):
    """Drive a mel streamer into a vocoder streamer; yields waveform
    chunks. Shared by stream_tts and the serving engine (which keeps
    both streamers warm across requests)."""
    pending = 0
    for mel_chunk in mel_s.stream(key, speaker_ids, text, sigma=sigma,
                                  in_lens=in_lens, temperature=temperature,
                                  max_frames=max_frames):
        audio = voc.push(mel_chunk)
        pending += mel_chunk.shape[2]
        if audio.shape[1]:
            yield audio
    # trim the final buffer to the gate's n_valid before flushing
    nv = int(mel_s.n_valid.max()) if mel_s.n_valid is not None else pending
    if voc._mel is not None and voc._mel.shape[2] > nv:
        voc._mel = voc._mel[:, :, :nv]
    tail = voc.flush()
    if tail.shape[1]:
        yield tail


def stream_tts(params, config, wg_params, wg_config, key, speaker_ids,
               text, sigma=0.5, wg_sigma=0.8, chunk_frames=40,
               gate_threshold=0.5, max_frames=2000, in_lens=None,
               context=24, lookahead=16, impl="nch", temperature=1.0):
    """Full streaming TTS: yields (B, n*HOP) float32 waveform chunks.

    Time-to-first-audio is one mel chunk + lookahead for forward-only
    models, plus the one-dispatch gated prelude for multi-flow models
    (the flagship n_flows=2 config streams too — see
    StreamingMelSynthesizer).
    """
    k_mel, k_voc = jax.random.split(key)
    mel_s = StreamingMelSynthesizer(
        params, config, chunk_frames=chunk_frames,
        temperature=temperature, gate_threshold=gate_threshold,
        max_frames=max_frames)
    voc = StreamingVocoder(wg_params, wg_config, k_voc, sigma=wg_sigma,
                           context=context, lookahead=lookahead, impl=impl)
    yield from pump_stream(mel_s, voc, k_mel, speaker_ids, text,
                           sigma=sigma, in_lens=in_lens)
