"""Batched multi-stream synthesis: one B=N streamer multiplexing N
concurrent streams.

The per-stream path (infer/streaming.py) pays one chunk dispatch per
stream per chunk: N concurrent streams cost N× the host dispatch rate
and N× the decoder weight-tile loading (the measured B=1 floor — see
ROADMAP "fused kernel physics": the scan step is weight-load-bound, so
a B=8 chunk costs about the same wall-clock as B=1). This module
amortizes both: a fixed pool of B slots advances ALL active streams
with ONE fused chunk dispatch per tick, and vocoder windows are batched
across slots.

TPU-first constraints drive the design:
- **Fixed shapes, compiled once**: the tick always runs at
  (chunk_frames, slots, n_mel) with text at one fixed Tk and vocoder
  groups padded to the full slot count; empty slots ride along as
  garbage lanes (free — the step is weight-load-bound, not FLOP-bound
  at these batch sizes). Joining a stream never recompiles.
- **One dispatch per stage**: the whole tick (per-slot latent
  generation, fresh-slot carry zeroing by mask, the AR chunk scan) is
  ONE jitted program; mel+gates come back in ONE packed fetch; each
  vocoder width group is one dispatch. Joining is one encode dispatch
  plus ONE jitted buffer-update dispatch (dynamic_update_slice at a
  traced slot index — no per-slot program specialization). This
  matters doubly on the dev tunnel (~27 ms per dispatch) and keeps
  host overhead flat on-host.
- **Join/leave between ticks**: a joining slot's encoder column,
  key-mask row, temperature/sigma/key entries are written in place;
  its scan-carry rows are zeroed INSIDE the next tick via a fresh-slot
  mask (so there is no host-device race on the carry). The AR state is
  positionless, so slots at different utterance offsets share one
  dispatch.
- **Per-slot everything**: latent keys, sigma, temperature ((B, 1)
  vectors — models/ar_step.py broadcasts them through the scan), gate
  n_valid, vocoder emission offsets. Each slot's audio equals the B=1
  streamer pipeline run with the same key (tests/test_multistream.py
  pins it stream-by-stream, including ragged gates and mid-run joins).
- **Batched vocoder windows**: slots with audio ready this tick are
  grouped by (bucketed) window width; each group is one WaveGlow
  dispatch with per-slot mel windows and per-slot absolute positions
  for the position-keyed latents (every slot's z equals its B=1 draw).

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


class MuxClosed(RuntimeError):
    """The stream was closed while its open() was still committing:
    the handle would never have produced step() events, so waiting on
    it would hang — open() raises this instead of returning it."""


class _Slot:
    __slots__ = ("handle", "key", "voc_key", "sigma", "c", "n_valid",
                 "fired", "mel_buf", "emitted", "done_mel",
                 "max_frames", "fresh", "pending_close", "joined",
                 "pending_join")

    def __init__(self, handle, key, voc_key, sigma, max_frames):
        self.handle = handle      # caller-facing unique stream id
        self.key = key            # latent key (mel stage)
        self.voc_key = voc_key    # latent key (vocoder stage)
        self.sigma = float(sigma)
        self.c = 0                # chunks consumed
        self.n_valid = None       # known after prelude (2-flow) / gate
        self.fired = False        # 1-flow: gate seen
        self.mel_buf = None       # host (n_mel, F) vocoder input buffer
        self.emitted = 0          # vocoder frames emitted
        self.done_mel = False     # mel stage exhausted
        self.max_frames = max_frames
        self.fresh = True         # carry rows zeroed by the next tick
        self.pending_close = False
        self.joined = False       # device state committed
        self.pending_join = None  # deferred-join payload (admission)


class MultiStreamTTS:
    """Fixed-slot TTS multiplexer: open() registers a stream, step()
    advances every active stream one mel chunk and returns any newly
    ready audio per stream. Thread-safe for one stepper thread plus
    concurrent open()/close() callers (the serving engine's layout).

    Usage:
        mux = MultiStreamTTS(params, cfg, wg_params, wg_cfg, slots=8)
        h = mux.open(jax.random.PRNGKey(1), speaker_id=0, text_ids=ids)
        while mux.active:
            for handle, audio, done in mux.step():
                ...  # audio: (n,) float32 in [-1, 1]; done ends it

    Per-stream outputs match the B=1 StreamingMelSynthesizer +
    StreamingVocoder pipeline run with the same key (same chunk size,
    max_frames, context, lookahead) — batching changes scheduling, not
    semantics.
    """

    def __init__(self, params, config, wg_params, wg_config, slots=8,
                 chunk_frames=40, text_len=128, max_frames=2000,
                 gate_threshold=0.5, wg_sigma=0.8, context=24,
                 lookahead=16, impl="nch", fused_prelude=False,
                 max_joins_per_tick=None):
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
        # join admission: None commits each join synchronously inside
        # open() (lowest solo-join TTFA); an int K defers the device-
        # side join to step(), which commits at most K per tick in
        # arrival order — under a rush of joins this keeps the tick
        # cadence of ALREADY-running streams flat instead of stalling
        # every stream behind a burst of encode/prelude dispatches
        self.max_joins_per_tick = (None if max_joins_per_tick is None
                                   else max(1, int(max_joins_per_tick)))
        self.n_flows = int(config["n_flows"])
        self.n_mel = int(config["n_mel_channels"])
        # 2-flow latents are stored chunk-aligned so the tick's
        # dynamic_slice never clamps (clamping would shift values vs
        # the B=1 path's zero-padded tail chunk)
        self._Npad = -(-self.max_frames // self.C) * self.C

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

        B, Tk, M, C = self.slots, self.Tk, self.n_mel, self.C
        dt = self._dtype
        # batched per-slot device state; empty slots: zero enc, a
        # one-key mask (an all-masked attention row would softmax to
        # NaN), neutral temperature/sigma/keys (their lanes compute
        # garbage that nothing reads; joins zero the carry rows)
        self._enc = None          # (Tk, B, D) — lazy: D after 1st encode
        km = np.zeros((B, Tk), bool)
        km[:, 0] = True
        self._key_mask = jnp.asarray(km)
        self._temp = jnp.ones((B, 1), jnp.float32)
        self._sigma = jnp.ones((B,), jnp.float32)
        self._keys = jnp.zeros((B, 2), jnp.uint32)
        self._z1_buf = (jnp.zeros((B, self._Npad, M), dt)
                        if self.n_flows > 1 else None)
        self._carry = None        # allocated on the first tick

        def encode1(p, sid, text, key_mask):
            return _encode_text(p, config, sid, text, key_mask)

        self._encode1 = jax.jit(encode1)

        def join(enc_buf, km_buf, temp_buf, sig_buf, key_buf,
                 enc1, km1, t, sg, k, b):
            """All of a join's buffer writes in ONE dispatch, with the
            slot index traced (no per-slot program specialization)."""
            enc_buf = jax.lax.dynamic_update_slice(
                enc_buf, enc1.astype(enc_buf.dtype), (0, b, 0))
            km_buf = jax.lax.dynamic_update_slice(km_buf, km1, (b, 0))
            temp_buf = jax.lax.dynamic_update_slice(
                temp_buf, t[None, None], (b, 0))
            sig_buf = jax.lax.dynamic_update_slice(
                sig_buf, sg[None], (b,))
            key_buf = jax.lax.dynamic_update_slice(
                key_buf, k[None, :], (b, 0))
            return enc_buf, km_buf, temp_buf, sig_buf, key_buf

        self._join = jax.jit(join)

        def _zero_fresh(carry, fresh_mask):
            return jax.tree.map(
                lambda x: jnp.where(
                    fresh_mask.reshape((B,) + (1,) * (x.ndim - 1)),
                    jnp.zeros((), x.dtype), x),
                carry)

        def chunk_core(p, z_chunk, enc, key_mask, carry, temp):
            return ar_step_infer(
                p["flows"][0], z_chunk, enc, key_mask=key_mask,
                temperature=temp, carry=carry, return_carry=True)

        if self.n_flows == 1:
            def tick(p, enc, key_mask, carry, temp, keys, sigmas, cs,
                     fresh_mask):
                """ONE dispatch: per-slot z draws (each exactly the
                B=1 streamer's (C, 1, M) fold_in draw), fresh-slot
                carry zeroing, and the batched AR chunk scan. Returns
                mel+gates packed into one array (one host fetch)."""
                carry = _zero_fresh(carry, fresh_mask)

                def draw(k, c, sg):
                    # sg cast to the compute dtype first: an f32 sigma
                    # array would promote a bf16 draw to f32 (the B=1
                    # path's weak Python-float sigma stays in dtype)
                    return sg.astype(dt) * jax.random.normal(
                        jax.random.fold_in(k, c), (C, 1, M), dt)

                z = jax.vmap(draw)(keys, cs, sigmas)    # (B, C, 1, M)
                z = jnp.transpose(z[:, :, 0, :], (1, 0, 2))
                mel, _attn, gates, carry = chunk_core(
                    p, z, enc, key_mask, carry, temp)
                # gates: (C, B) raw — packed as an extra mel channel so
                # the host needs only ONE fetch per tick
                packed = jnp.concatenate(
                    [mel, gates[:, :, None].astype(mel.dtype)], axis=2)
                return packed, carry
        else:
            def tick(p, enc, key_mask, carry, temp, z1_buf, cs,
                     fresh_mask):
                """2-flow variant: z chunks sliced from the stored
                flow-0 latent buffer (chunk-aligned, so slices never
                clamp)."""
                carry = _zero_fresh(carry, fresh_mask)

                def slice1(zb, c):
                    return jax.lax.dynamic_slice(zb, (c * C, 0),
                                                 (C, M))

                z = jax.vmap(slice1)(z1_buf, cs)        # (B, C, M)
                z = jnp.transpose(z, (1, 0, 2))
                mel, _attn, gates, carry = chunk_core(
                    p, z, enc, key_mask, carry, temp)
                # gates: (C, B) raw — packed as an extra mel channel so
                # the host needs only ONE fetch per tick
                packed = jnp.concatenate(
                    [mel, gates[:, :, None].astype(mel.dtype)], axis=2)
                return packed, carry

        self._tick = jax.jit(tick)

        self._prelude1 = self._store_z1 = None
        if self.n_flows > 1:
            n_flows, gate_thr = self.n_flows, self.gate_threshold
            Nmax, Npad = self.max_frames, self._Npad

            def prelude(p, k, sg, enc, key_mask, temp):
                """Flows n-1..1 of the reversed inference chain for ONE
                joining stream (reference:flowtron.py:924-929 minus the
                final inverse) — the same math (and the same latent
                draw shape, so the same key gives the same utterance)
                as StreamingMelSynthesizer._stream_two_stage."""
                residual = sg.astype(dt) * jax.random.normal(
                    k, (1, M, Nmax), dt)
                z = jnp.transpose(residual, (2, 0, 1))
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
                z1 = jnp.pad(z[:, 0], ((0, Npad - Nmax), (0, 0)))
                return z1, n_valid

            def store_z1(z1_buf, z1, b):
                return jax.lax.dynamic_update_slice(
                    z1_buf, z1[None], (b, 0, 0))

            self._prelude1 = jax.jit(prelude)
            self._store_z1 = jax.jit(store_z1)

        # batched sliding-window vocoder: per-slot windows, absolute
        # starts and latent keys, always padded to the full slot count
        # — ONE compiled program per window width, always warm at any
        # occupancy (under-occupied lanes are idle device time anyway)
        sq = HOP // wg_config["n_group"]
        wg_sig = self.wg_sigma
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
        """Register a stream; returns its unique handle.

        key: PRNG key — the stream's latents are a pure function of it
        (split into mel/vocoder halves exactly like stream_tts).
        text_ids: (n,) int ids, n <= text_len. Raises MuxFull when no
        slot is free. Device cost: one encode dispatch + one buffer-
        update dispatch (+ the prelude for multi-flow models, which
        makes open() the TTFA-critical call there). With
        max_joins_per_tick set, the device work is instead deferred to
        step() (at most K joins committed per tick, arrival order);
        open() then only reserves the slot and returns."""
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
        payload = (int(speaker_id), text_pad, n, float(temperature),
                   float(sigma))
        if self.max_joins_per_tick is not None:
            # deferred: step() commits (admission-capped). pending_join
            # is set under the same lock that reserved the slot, so the
            # stepper can never observe a reserved-but-payloadless slot
            with self._lock:
                slot.pending_join = payload
            return handle
        if not self._device_join(b, slot, *payload):
            # close() raced us: the stream never joined and can never
            # emit — a returned handle would leave the caller waiting
            # forever
            raise MuxClosed(f"stream {handle} closed during open()")
        return handle

    def _device_join(self, b, slot, speaker_id, text_pad, n,
                     temperature, sigma):
        """Run the device-side join (encode [+ prelude] + ONE buffer-
        commit dispatch) for a reserved slot. Returns False if the slot
        was freed (raced close) before the commit could land."""
        sid = jnp.asarray([speaker_id], jnp.int32)
        km1 = sequence_mask(jnp.asarray([n]), self.Tk)      # (1, Tk)
        enc1 = self._encode1(self.params, sid, jnp.asarray(text_pad),
                             km1)                           # (Tk, 1, D)
        t_arr = jnp.asarray(temperature, jnp.float32)
        sg_arr = jnp.asarray(sigma, jnp.float32)

        z1 = None
        if self.n_flows > 1:
            z1, nv = self._prelude1(self.params, slot.key, sg_arr,
                                    enc1, km1, t_arr)
            slot.n_valid = max(1, min(int(np.asarray(nv)[0]),
                                      slot.max_frames))

        with self._lock:
            if self._slots[b] is not slot:
                return False
            if self._enc is None:
                self._enc = jnp.zeros(
                    (self.Tk, self.slots, enc1.shape[2]), enc1.dtype)
            b_arr = jnp.asarray(b, jnp.int32)
            (self._enc, self._key_mask, self._temp, self._sigma,
             self._keys) = self._join(
                self._enc, self._key_mask, self._temp, self._sigma,
                self._keys, enc1, km1, t_arr, sg_arr,
                jnp.asarray(slot.key, jnp.uint32), b_arr)
            if z1 is not None:
                self._z1_buf = self._store_z1(self._z1_buf, z1, b_arr)
            slot.pending_join = None
            slot.joined = True
        return True

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

    def warmup(self, ticks=None):
        """Compile the whole serving path before real traffic: run one
        throwaway stream (its slot frees itself) covering the tick
        program, the join program, and the first/steady/flush vocoder
        window widths. Group sizes are always padded to the slot
        count, so one stream compiles the same programs full occupancy
        uses."""
        h = self.open(jax.random.PRNGKey(0), 0,
                      np.ones((min(4, self.Tk),), np.int64),
                      max_frames=min(self.max_frames, 3 * self.C))
        n = 0
        while self.active and (ticks is None or n < ticks):
            for hh, _a, _d in self.step():
                pass
            n += 1

    # -- the tick ---------------------------------------------------------
    def _init_carry(self):
        """Explicit zero carry matching ar_step_infer's fresh-start
        layout, so the tick compiles ONE trace (the carry is always a
        concrete pytree, never None)."""
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
        """Advance every joined stream one mel chunk with ONE fused
        dispatch, vocode ready spans in width-grouped batches, and
        return [(handle, audio (n,) float32, done), ...]. A done
        stream's slot is freed before returning. Returns [] when
        nothing is active."""
        if self.max_joins_per_tick is not None:
            # admission: commit at most K deferred joins, oldest first,
            # so a rush of open()s cannot stall the running streams'
            # tick cadence behind a burst of encode/prelude dispatches
            with self._lock:
                pend = sorted(
                    ((b, s) for b, s in enumerate(self._slots)
                     if s is not None and not s.joined
                     and not s.pending_close
                     and s.pending_join is not None),
                    key=lambda bs: bs[1].handle)
                pend = pend[:self.max_joins_per_tick]
            for b, s in pend:
                self._device_join(b, s, *s.pending_join)
        with self._lock:
            for b, s in enumerate(self._slots):
                if s is not None and s.pending_close:
                    self._slots[b] = None
            live = [(b, s) for b, s in enumerate(self._slots)
                    if s is not None and s.joined]
            enc, key_mask, temp = self._enc, self._key_mask, self._temp
            keys, sigmas, z1_buf = self._keys, self._sigma, self._z1_buf
            fresh_mask = np.zeros((self.slots,), bool)
            for b, s in live:
                if s.fresh:
                    fresh_mask[b] = True
                    s.fresh = False
        if not live:
            return []

        C, M, B = self.C, self.n_mel, self.slots
        if self._carry is None:
            self._carry = self._init_carry()

        events = []
        mel_live = [(b, s) for b, s in live if not s.done_mel]
        if mel_live:
            cs = np.zeros((B,), np.int32)
            for b, s in mel_live:
                cs[b] = s.c
            if self.n_flows == 1:
                packed, self._carry = self._tick(
                    self.params, enc, key_mask, self._carry, temp,
                    keys, sigmas, jnp.asarray(cs),
                    jnp.asarray(fresh_mask))
            else:
                packed, self._carry = self._tick(
                    self.params, enc, key_mask, self._carry, temp,
                    z1_buf, jnp.asarray(cs), jnp.asarray(fresh_mask))
            packed_h = np.asarray(packed, np.float32)  # ONE fetch
            mel_h = packed_h[:, :, :M]                 # (C, B, M)
            gates_h = packed_h[:, :, M]                # (C, B)

            # per-slot gate bookkeeping + mel emission (trimmed to
            # each stream's own n_valid — frames past a gate never
            # reach the vocoder)
            for b, s in mel_live:
                if self._gate_in_stream and not s.fired:
                    hit = gates_h[:, b] > self.gate_threshold
                    if hit.any():
                        s.fired = True
                        s.n_valid = min(s.c * C + int(hit.argmax()) + 1,
                                        s.max_frames)
                cap = s.n_valid if s.n_valid is not None else s.max_frames
                n_real = min(C, cap - s.c * C)
                if n_real > 0:
                    mel_b = mel_h[:n_real, b].T        # (n_mel, n_real)
                    s.mel_buf = mel_b if s.mel_buf is None else \
                        np.concatenate([s.mel_buf, mel_b], axis=1)
                s.c += 1
                if s.c * C >= cap:
                    s.done_mel = True
                    if s.n_valid is None:   # never gated: cap is final
                        s.n_valid = cap

        # vocoder: per-slot emission specs (push semantics; a slot
        # finishing its mel this tick adds the flush emit too, so its
        # window sequence equals the B=1 push-then-flush), then one
        # dispatch per distinct window width
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
            Gp = self.slots if G <= self.slots else \
                1 << (G - 1).bit_length()
            mel_wins = np.zeros((Gp, M, W), np.float32)
            w0s = np.zeros((Gp,), np.int32)
            keys_l = []
            for i, (b, s, e0, n, w0, at_end) in enumerate(members):
                mel_wins[i] = s.mel_buf[:, w0:w0 + W]
                w0s[i] = w0
                keys_l.append(s.voc_key)
            for i in range(G, Gp):                  # duplicate-pad
                mel_wins[i] = mel_wins[0]
                w0s[i] = w0s[0]
                keys_l.append(keys_l[0])
            audio = self._window_audio(
                self.wg_params, jnp.asarray(mel_wins, self._dtype),
                jnp.asarray(w0s), jnp.stack(keys_l))
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
