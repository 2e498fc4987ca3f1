"""Batched multi-stream synthesis: one B=N streamer multiplexing N
concurrent streams.

The per-stream path (infer/streaming.py) pays one chunk dispatch per
stream per chunk: N concurrent streams cost N× the host dispatch rate
and N× the decoder weight-tile loading (the measured B=1 floor — see
ROADMAP "fused kernel physics": the scan step is weight-load-bound, so
a B=8 chunk costs about the same wall-clock as B=1). This module
amortizes both: a fixed pool of B slots advances ALL active streams
with ONE chunk dispatch per tick, and vocoder windows are batched
across slots.

TPU-first constraints drive the design:
- **Fixed shapes, compiled once**: the chunk step always runs at
  (chunk_frames, slots, n_mel) with text at one fixed Tk; empty slots
  ride along as zeros (free — the step is weight-load-bound, not
  FLOP-bound at these batch sizes). Joining a stream never recompiles.
- **Join/leave between ticks**: a joining slot's scan-carry rows are
  zeroed and its encoder column / key-mask row / temperature entry
  written in place (`.at[slot].set`) — the AR state is positionless,
  so slots at different utterance offsets share one dispatch.
- **Per-slot everything**: latent keys, sigma, temperature ((B, 1)
  vectors — models/ar_step.py broadcasts them through the scan), gate
  n_valid, vocoder emission offsets. Each slot's audio equals the B=1
  streamer pipeline run with the same key (tests/test_multistream.py
  pins it stream-by-stream, including ragged gates and mid-run joins).
- **Batched vocoder windows**: slots with audio ready this tick are
  grouped by (bucketed) window width; each group is one WaveGlow
  dispatch with per-slot mel windows, per-slot absolute positions for
  the position-keyed latents (every slot's z equals its B=1 draw), and
  group sizes padded to powers of two to bound compile count.

The reference has no streaming at all (reference:inference.py:40-132
synthesizes the full utterance, then runs the full vocoder); this is
the serving-side analog of the batched offline path.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np

from flowtron_tpu.models.ar_step import (
    ar_step_infer, ar_back_step_infer,
)
from flowtron_tpu.models.flowtron import _encode_text
from flowtron_tpu.utils.masks import sequence_mask
from flowtron_tpu.vocoder.waveglow import waveglow_infer_z
from flowtron_tpu.infer.streaming import (
    HOP, positional_z, window_spec,
)


class MuxFull(RuntimeError):
    """All slots busy — callers map this to 429/retry."""


class _Slot:
    __slots__ = ("handle", "key", "voc_key", "sigma", "c", "n_valid",
                 "fired", "z1", "mel_buf", "emitted", "done_mel",
                 "max_frames", "fresh", "pending_close", "joined")

    def __init__(self, handle, key, voc_key, sigma, max_frames):
        self.handle = handle      # caller-facing unique stream id
        self.key = key            # latent key (mel stage)
        self.voc_key = voc_key    # latent key (vocoder stage)
        self.sigma = float(sigma)
        self.c = 0                # chunks consumed
        self.n_valid = None       # known after prelude (2-flow) / gate
        self.fired = False        # 1-flow: gate seen
        self.z1 = None            # (N, n_mel) flow-0 latents (2-flow)
        self.mel_buf = None       # host (n_mel, F) vocoder input buffer
        self.emitted = 0          # vocoder frames emitted
        self.done_mel = False     # mel stage exhausted
        self.max_frames = max_frames
        self.fresh = True         # carry rows need zeroing (stepper's
        #                           job — only step() mutates the carry)
        self.pending_close = False
        self.joined = False       # device state (enc/mask/temp) written


class MultiStreamTTS:
    """Fixed-slot TTS multiplexer: open() registers a stream, step()
    advances every active stream one mel chunk and returns any newly
    ready audio per stream. Thread-safe for one stepper thread plus
    concurrent open()/close() callers (the serving engine's layout).

    Usage:
        mux = MultiStreamTTS(params, cfg, wg_params, wg_cfg, slots=8)
        h = mux.open(jax.random.PRNGKey(1), speaker_id=0, text_ids=ids)
        while mux.active:
            for slot, audio, done in mux.step():
                ...  # audio: (n,) float32 in [-1, 1]; done frees `slot`

    Per-stream outputs match the B=1 StreamingMelSynthesizer +
    StreamingVocoder pipeline run with the same key (same chunk size,
    max_frames, context, lookahead) — batching changes scheduling, not
    semantics.
    """

    def __init__(self, params, config, wg_params, wg_config, slots=8,
                 chunk_frames=40, text_len=128, max_frames=2000,
                 gate_threshold=0.5, wg_sigma=0.8, context=24,
                 lookahead=16, impl="nch", fused_prelude=False):
        self.params = params
        self.config = config
        self.wg_params = wg_params
        self.wg_config = wg_config
        self.slots = int(slots)
        self.C = int(chunk_frames)
        self.Tk = int(text_len)
        self.max_frames = int(max_frames)
        self.gate_threshold = float(gate_threshold)
        self.wg_sigma = float(wg_sigma)
        self.context = int(context)
        self.lookahead = int(lookahead)
        self.n_flows = int(config["n_flows"])
        self.n_mel = int(config["n_mel_channels"])

        from flowtron_tpu.utils.weights import resolve_weight
        self._dtype = resolve_weight(
            params["flows"][0]["conv"]["w"]).dtype
        self._gate_in_stream = (self.n_flows == 1
                                and "gate_layer" in params["flows"][0])

        self._lock = threading.Lock()
        self._slots = [None] * self.slots  # _Slot or None
        self._next_handle = 0     # handles are unique across the mux
        #                           lifetime (slots get reused; handles
        #                           never do — step() events carry them)

        B, Tk = self.slots, self.Tk
        # batched per-slot device state; empty slots: zero enc, a
        # one-key mask (an all-masked attention row would softmax to
        # NaN), neutral temperature
        self._enc = None          # (Tk, B, D) — lazy: D after 1st encode
        km = np.zeros((B, Tk), bool)
        km[:, 0] = True
        self._key_mask = jnp.asarray(km)
        self._temp = jnp.ones((B, 1), jnp.float32)
        self._carry = None        # stepper-owned (see _Slot.fresh)

        def encode1(p, sid, text, key_mask):
            return _encode_text(p, config, sid, text, key_mask)

        def chunk_step(p, z_chunk, enc, key_mask, carry, temp):
            return ar_step_infer(
                p["flows"][0], z_chunk, enc, key_mask=key_mask,
                temperature=temp, carry=carry, return_carry=True)

        self._encode1 = jax.jit(encode1)
        self._chunk = jax.jit(chunk_step)

        self._prelude1 = None
        if self.n_flows > 1:
            n_flows, gate_thr = self.n_flows, self.gate_threshold

            def prelude(p, residual, enc, key_mask, temp):
                """Flows n-1..1 of the reversed inference chain for ONE
                joining stream (reference:flowtron.py:924-929 minus the
                final inverse) — the same math as
                StreamingMelSynthesizer._stream_two_stage's prelude."""
                z = residual
                n_valid = None
                for rev_i, flow_params in enumerate(
                        reversed(p["flows"][1:])):
                    i = n_flows - 1 - rev_i
                    step = ar_step_infer if i % 2 == 0 else \
                        ar_back_step_infer
                    z, _, n_valid = step(
                        flow_params, z, enc, key_mask, None, temp,
                        gate_thr, n_valid=n_valid, fused=fused_prelude)
                if n_valid is None:
                    n_valid = jnp.full((z.shape[1],), z.shape[0],
                                       jnp.int32)
                return z, n_valid

            self._prelude1 = jax.jit(prelude)

        # batched sliding-window vocoder: per-slot windows, absolute
        # starts and latent keys; one compile per (group-size bucket,
        # width bucket)
        sq = HOP // wg_config["n_group"]
        wg_sig, dt = self.wg_sigma, self._dtype
        n_early_every = wg_config["n_early_every"]
        n_wg_flows = wg_config["n_flows"]

        def window_audio_batch(wgp, mel_wins, w0s, keys):
            """mel_wins: (G, n_mel, W); w0s: (G,) frame starts; keys:
            (G, ...) per-slot latent keys. Latents come from the same
            positional_z draw as the B=1 path (B=1 per slot, vmapped
            over slots), so each slot's audio equals its solo-streamer
            audio for the same key."""
            W = mel_wins.shape[2]
            Tg = W * sq

            def draw1(k, w0):
                z_main, z_early = positional_z(
                    k, wg_config, 1, w0 * sq, Tg, wg_sig, dt)
                return z_main, tuple(
                    z for z in z_early if z is not None)

            z_main, z_early_t = jax.vmap(draw1)(keys, w0s)
            z_main = z_main[:, 0]                      # (G, n_ch, Tg)
            z_early, ei = [], 0
            for f in range(n_wg_flows):
                if f % n_early_every == 0 and f > 0:
                    z_early.append(z_early_t[ei][:, 0])
                    ei += 1
                else:
                    z_early.append(None)
            return waveglow_infer_z(wgp, wg_config, mel_wins, z_main,
                                    z_early, impl=impl)

        self._window_audio = jax.jit(window_audio_batch)

    # -- registration -----------------------------------------------------
    @property
    def active(self):
        with self._lock:
            return sum(s is not None for s in self._slots)

    def open(self, key, speaker_id, text_ids, in_len=None, sigma=0.5,
             temperature=1.0, max_frames=None):
        """Register a stream; returns its slot handle.

        key: PRNG key — the stream's latents are a pure function of it
        (split into mel/vocoder halves exactly like stream_tts).
        text_ids: (n,) int ids, n <= text_len. Raises MuxFull when no
        slot is free. The prelude for multi-flow models runs here (one
        B=1 dispatch), so open() is the TTFA-critical call."""
        text_ids = np.asarray(text_ids)
        n = int(in_len) if in_len is not None else int(text_ids.shape[0])
        if n < 1:
            raise ValueError("empty text")
        if n > self.Tk:
            raise ValueError(f"text length {n} > mux text_len {self.Tk}")
        cap = self.max_frames if max_frames is None \
            else min(int(max_frames), self.max_frames)

        with self._lock:
            try:
                b = self._slots.index(None)
            except ValueError:
                raise MuxFull(f"all {self.slots} mux slots busy")
            k_mel, k_voc = jax.random.split(key)
            handle = self._next_handle
            self._next_handle += 1
            slot = _Slot(handle, k_mel, k_voc, sigma, cap)
            self._slots[b] = slot   # reserved; joined=False until the
            #                         device state below is committed

        text_pad = np.zeros((1, self.Tk), np.int64)
        text_pad[0, :n] = text_ids[:n]
        sid = jnp.asarray([int(speaker_id)], jnp.int32)
        km1 = sequence_mask(jnp.asarray([n]), self.Tk)      # (1, Tk)
        enc1 = self._encode1(self.params, sid, jnp.asarray(text_pad),
                             km1)                           # (Tk, 1, D)

        if self.n_flows > 1:
            # (1, n_mel, N) then transpose — the exact draw shape of
            # StreamingMelSynthesizer._stream_two_stage, so the same
            # key yields the same utterance
            residual = slot.sigma * jax.random.normal(
                k_mel, (1, self.n_mel, self.max_frames), self._dtype)
            z_tbm = jnp.transpose(residual, (2, 0, 1))
            z1, nv = self._prelude1(self.params, z_tbm, enc1, km1,
                                    jnp.asarray(float(temperature),
                                                jnp.float32))
            slot.z1 = z1[:, 0]                              # (N, n_mel)
            slot.n_valid = max(1, min(int(np.asarray(nv)[0]), cap))

        with self._lock:
            if self._slots[b] is not slot:   # close() raced us
                return handle
            if self._enc is None:
                self._enc = jnp.zeros(
                    (self.Tk, self.slots, enc1.shape[2]), enc1.dtype)
            self._enc = self._enc.at[:, b].set(enc1[:, 0])
            self._key_mask = self._key_mask.at[b].set(km1[0])
            self._temp = self._temp.at[b, 0].set(float(temperature))
            slot.joined = True
        return handle

    def _find(self, handle):
        for s in self._slots:
            if s is not None and s.handle == handle:
                return s
        return None

    def close(self, handle):
        """Abort/free a stream early (client went away). Freed at the
        next step() tick; until then its lane computes into the void."""
        with self._lock:
            s = self._find(handle)
            if s is not None:
                s.pending_close = True

    def n_valid_of(self, handle):
        """Valid mel frames for a live stream (None until known)."""
        with self._lock:
            s = self._find(handle)
            return None if s is None else s.n_valid

    # -- the tick ---------------------------------------------------------
    def _init_carry(self):
        """Explicit zero carry matching ar_step_infer's fresh-start
        layout, so the chunk step compiles ONE trace (the carry is
        always a concrete pytree, never None)."""
        from flowtron_tpu.infer.quantize import weight_shape
        p = self.params["flows"][0]
        H = weight_shape(p["lstm"]["layers"][0]["w_hh"])[0]
        n_layers = len(p["lstm"]["layers"])
        B, Tk, M = self.slots, self.Tk, self.n_mel

        def z(*s):
            return jnp.zeros(s, self._dtype)

        return (z(B, H), z(B, H),
                tuple(z(B, H) for _ in range(n_layers)),
                tuple(z(B, H) for _ in range(n_layers)),
                z(B, M), z(B, Tk), z(B, Tk))

    def step(self):
        """Advance every joined stream one mel chunk with ONE decoder
        dispatch, vocode ready spans in width-grouped batches, and
        return [(handle, audio (n,) float32, done), ...]. A done
        stream's slot is freed before returning. Returns [] when
        nothing is active."""
        with self._lock:
            for b, s in enumerate(self._slots):
                if s is not None and s.pending_close:
                    self._slots[b] = None
            live = [(b, s) for b, s in enumerate(self._slots)
                    if s is not None and s.joined]
            enc, key_mask, temp = self._enc, self._key_mask, self._temp
            fresh = [b for b, s in live if s.fresh]
            for _, s in live:
                s.fresh = False
        if not live:
            return []

        C, M, B = self.C, self.n_mel, self.slots
        if self._carry is None:
            self._carry = self._init_carry()
        elif fresh:
            # zero the joining slots' carry rows — done here (stepper
            # thread) so a tick in flight can never clobber the reset
            idx = jnp.asarray(fresh)
            self._carry = jax.tree.map(
                lambda x: x.at[idx].set(0), self._carry)

        events = []
        mel_live = [(b, s) for b, s in live if not s.done_mel]
        if mel_live:
            # 1) per-slot z chunks, each drawn exactly as its B=1
            #    streamer would; zeros in idle lanes
            z_parts = {}
            for b, s in mel_live:
                if s.z1 is not None:     # 2-flow: slice stored flow-0 z
                    z_c = s.z1[s.c * C:(s.c + 1) * C]
                    if z_c.shape[0] < C:
                        z_c = jnp.concatenate(
                            [z_c, jnp.zeros((C - z_c.shape[0], M),
                                            z_c.dtype)], 0)
                    z_parts[b] = z_c[:, None, :]
                else:                    # 1-flow: per-chunk draw
                    z_parts[b] = s.sigma * jax.random.normal(
                        jax.random.fold_in(s.key, s.c), (C, 1, M),
                        self._dtype)
            z_chunk = jnp.concatenate(
                [z_parts.get(b, jnp.zeros((C, 1, M), self._dtype))
                 for b in range(B)], axis=1)           # (C, B, M)

            # 2) one batched chunk dispatch for every active stream
            mel_c, _attn, gates_c, self._carry = self._chunk(
                self.params, z_chunk, enc, key_mask, self._carry, temp)
            mel_h = None      # host fetches, once per tick, lazily
            gates_h = None

            # 3) per-slot gate bookkeeping + mel emission (trimmed to
            #    each stream's own n_valid — frames past a gate never
            #    reach the vocoder)
            for b, s in mel_live:
                if self._gate_in_stream and not s.fired:
                    if gates_h is None:
                        gates_h = np.asarray(gates_c, np.float32)
                    hit = gates_h[:, b] > self.gate_threshold
                    if hit.any():
                        s.fired = True
                        s.n_valid = min(s.c * C + int(hit.argmax()) + 1,
                                        s.max_frames)
                cap = s.n_valid if s.n_valid is not None else s.max_frames
                n_real = min(C, cap - s.c * C)
                if n_real > 0:
                    if mel_h is None:
                        mel_h = np.asarray(mel_c)
                    mel_b = mel_h[:n_real, b].T        # (n_mel, n_real)
                    s.mel_buf = mel_b if s.mel_buf is None else \
                        np.concatenate([s.mel_buf, mel_b], axis=1)
                s.c += 1
                if s.c * C >= cap:
                    s.done_mel = True
                    if s.n_valid is None:   # never gated: cap is final
                        s.n_valid = cap

        # 4) vocoder: per-slot emission specs (push semantics; a slot
        #    finishing its mel this tick adds the flush emit too, so
        #    its window sequence equals the B=1 push-then-flush), then
        #    one dispatch per distinct window width
        groups = {}   # width -> [(b, slot, e0, n, w0, at_end), ...]

        def enqueue(b, s, e0, n, at_end):
            w0, w1 = window_spec(e0, n, s.mel_buf.shape[1],
                                 self.context, self.lookahead, at_end)
            groups.setdefault(w1 - w0, []).append(
                (b, s, e0, n, w0, at_end))

        finals = {}   # slot -> [audio pieces] for finishing slots
        for b, s in live:
            if s.mel_buf is None:
                if s.done_mel:     # gated before any frame emitted
                    events.append((s.handle,
                                   np.zeros((0,), np.float32), True))
                continue
            F = s.mel_buf.shape[1]
            e0 = s.emitted
            if s.done_mel:
                finals[b] = []
            ready = F - self.lookahead - e0
            if ready > 0:
                enqueue(b, s, e0, ready, False)
                e0 += ready
            if s.done_mel:
                tail = F - e0
                if tail > 0:
                    enqueue(b, s, e0, tail, True)
                elif ready <= 0:   # nothing at all left to vocode
                    del finals[b]
                    events.append((s.handle,
                                   np.zeros((0,), np.float32), True))

        for W, members in sorted(groups.items()):
            G = len(members)
            Gp = 1 << (G - 1).bit_length()          # pad to power of 2
            mel_wins = np.zeros((Gp, M, W), np.float32)
            w0s = np.zeros((Gp,), np.int32)
            keys = []
            for i, (b, s, e0, n, w0, at_end) in enumerate(members):
                mel_wins[i] = s.mel_buf[:, w0:w0 + W]
                w0s[i] = w0
                keys.append(s.voc_key)
            for i in range(G, Gp):                  # duplicate-pad
                mel_wins[i] = mel_wins[0]
                w0s[i] = w0s[0]
                keys.append(keys[0])
            audio = self._window_audio(
                self.wg_params, jnp.asarray(mel_wins, self._dtype),
                jnp.asarray(w0s), jnp.stack(keys))
            audio = np.asarray(jax.device_get(audio), np.float32)
            for i, (b, s, e0, n, w0, at_end) in enumerate(members):
                lo = (e0 - w0) * HOP
                out = audio[i, lo:lo + n * HOP]
                s.emitted = e0 + n
                if b in finals:
                    finals[b].append((e0, out))
                else:
                    events.append((s.handle, out, False))

        slot_of = {b: s for b, s in live}
        for b, pieces in finals.items():
            pieces.sort(key=lambda p: p[0])
            out = np.concatenate([p[1] for p in pieces]) if pieces \
                else np.zeros((0,), np.float32)
            events.append((slot_of[b].handle, out, True))

        done_handles = {h for h, _a, d in events if d}
        if done_handles:
            with self._lock:
                for b, s in enumerate(self._slots):
                    if s is not None and s.handle in done_handles:
                        self._slots[b] = None
        return events
