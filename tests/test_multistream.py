"""Batched multi-stream multiplexer: per-stream outputs must equal the
B=1 streamer pipeline run with the same keys.

The mux (infer/multistream.py) advances N concurrent streams with one
chunk dispatch per tick and batches vocoder windows across streams.
Batching must change scheduling only, never semantics: every test
compares a mux slot's audio/mel against the solo
StreamingMelSynthesizer + StreamingVocoder pipeline (the round-3-tested
B=1 path, itself pinned against the offline pass in test_streaming.py)
with identical keys, chunking, context and lookahead — including ragged
gate lengths, mid-run joins, and the flagship 2-flow prelude topology.
The reference has no streaming at all (reference:inference.py:40-132).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from flowtron_tpu.models import flowtron_init
from flowtron_tpu.infer.streaming import (
    StreamingMelSynthesizer, StreamingVocoder, pump_stream,
)
from flowtron_tpu.infer.multistream import MultiStreamTTS, MuxFull
from flowtron_tpu.vocoder import waveglow_init

SMALL = dict(n_speakers=2, n_speaker_dim=4, n_text=185, n_text_dim=12,
             n_mel_channels=8, n_hidden=16, n_attn_channels=8,
             n_lstm_layers=2, mel_encoder_n_hidden=8)
# tiny streaming geometry shared by mux and solo reference runs
GEO = dict(chunk_frames=8, context=8, lookahead=4)
MAXF = 48


@pytest.fixture(scope="module")
def model1():
    params, config = flowtron_init(jax.random.PRNGKey(0), n_flows=1,
                                   use_gate_layer=True, **SMALL)
    f = params["flows"][0]
    f["conv"]["w"] = 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                              f["conv"]["w"].shape)
    return params, config


@pytest.fixture(scope="module")
def model2():
    params, config = flowtron_init(jax.random.PRNGKey(5), n_flows=2,
                                   use_gate_layer=True, **SMALL)
    for f in params["flows"]:
        f["conv"]["w"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(6), f["conv"]["w"].shape)
    return params, config


@pytest.fixture(scope="module")
def wg_small():
    wgp, cfg = waveglow_init(jax.random.PRNGKey(2), n_mel_channels=8,
                             n_flows=4, n_group=8, n_early_every=2,
                             n_early_size=2, n_layers=3, n_channels=16)
    # WaveGlow's WN end convs are zero-init (identity couplings), so an
    # untrained vocoder's audio ignores mel entirely — which would let
    # a mel-window routing bug in the batched vocoder pass every
    # equality test. Perturb them so audio is mel-sensitive.
    for f in range(cfg["n_flows"]):
        e = wgp["wn"][f]["end"]
        e["w"] = 0.05 * jax.random.normal(jax.random.PRNGKey(70 + f),
                                          e["w"].shape)
    return wgp, cfg


def solo_audio(params, config, wg, key, sid, ids, Tk, gate_threshold,
               sigma=0.5, dtype=jnp.float32):
    """The B=1 reference pipeline with mux-identical settings: padded
    text + in_lens (the mux always masks), same key split, same
    geometry. Returns (audio (n,), n_valid)."""
    wg_params, wg_cfg = wg
    k_mel, k_voc = jax.random.split(key)
    mel_s = StreamingMelSynthesizer(
        params, config, chunk_frames=GEO["chunk_frames"],
        gate_threshold=gate_threshold, max_frames=MAXF)
    voc = StreamingVocoder(wg_params, wg_cfg, k_voc, sigma=0.8,
                           context=GEO["context"],
                           lookahead=GEO["lookahead"], dtype=dtype)
    n = len(ids)
    text = np.zeros((1, Tk), np.int64)
    text[0, :n] = ids
    chunks = list(pump_stream(
        mel_s, voc, k_mel, jnp.zeros((1,), jnp.int32) + sid,
        jnp.asarray(text), sigma=sigma, in_lens=jnp.asarray([n])))
    audio = np.concatenate([np.asarray(c)[0] for c in chunks]) \
        if chunks else np.zeros((0,), np.float32)
    return audio, int(mel_s.n_valid[0])


def make_mux(params, config, wg, slots, gate_threshold, Tk=12):
    wg_params, wg_cfg = wg
    return MultiStreamTTS(params, config, wg_params, wg_cfg,
                          slots=slots, text_len=Tk, max_frames=MAXF,
                          gate_threshold=gate_threshold, **GEO)


def drain(mux, handles, max_ticks=64):
    """Run ticks until every handle finishes; returns {h: audio}."""
    out = {h: [] for h in handles}
    done = set()
    for _ in range(max_ticks):
        for b, audio, fin in mux.step():
            if b in out:
                out[b].append(audio)
                if fin:
                    done.add(b)
        if done >= set(handles) and mux.active == 0:
            break
    assert done >= set(handles), (done, handles)
    return {h: (np.concatenate(v) if v else np.zeros((0,), np.float32))
            for h, v in out.items()}


class TestMux1Flow:
    def test_matches_solo_streams_ragged_gates(self, model1, wg_small):
        """Three streams, different texts/keys, gates firing at
        different frames: each slot's audio == its solo B=1 run."""
        params, config = model1
        rng = np.random.default_rng(0)
        # measured on this model: stream 1 gates at frame 1, streams 0
        # and 2 never cross 0.55 and run to the max_frames cap — ragged
        # lifetimes, both termination paths
        thr = 0.55
        streams = [
            (jax.random.PRNGKey(10 + i), i % 2,
             rng.integers(1, 185, (4 + 2 * i,)))
            for i in range(3)
        ]
        mux = make_mux(params, config, wg_small, slots=4,
                       gate_threshold=thr)
        handles = [mux.open(k, sid, ids) for k, sid, ids in streams]
        nv_seen = {}
        for h in handles:
            nv_seen[h] = mux.n_valid_of(h)
        got = drain(mux, handles)

        nvs = []
        for h, (k, sid, ids) in zip(handles, streams):
            want, nv = solo_audio(params, config, wg_small, k, sid,
                                  ids, 12, thr)
            nvs.append(nv)
            assert got[h].shape == want.shape, (h, got[h].shape,
                                               want.shape)
            np.testing.assert_allclose(got[h], want, atol=2e-4)
        # gates must actually be ragged for this test to mean anything
        assert len(set(nvs)) > 1, nvs

    def test_join_mid_run(self, model1, wg_small):
        """A stream joining after another has consumed chunks still
        equals its solo run (carry rows reset, slot state isolated)."""
        params, config = model1
        rng = np.random.default_rng(1)
        thr = 0.55   # rarely crossed on this model: streams live for
        #              multiple ticks, so the join really is mid-run
        kA, kB = jax.random.PRNGKey(20), jax.random.PRNGKey(21)
        idsA = rng.integers(1, 185, (6,))
        idsB = rng.integers(1, 185, (9,))

        mux = make_mux(params, config, wg_small, slots=2,
                       gate_threshold=thr)
        hA = mux.open(kA, 0, idsA)
        outA, outB = [], []
        for _ in range(2):          # A runs alone for two ticks
            for b, audio, fin in mux.step():
                assert b == hA
                outA.append(audio)
        hB = mux.open(kB, 1, idsB)  # B joins mid-run
        doneA = doneB = False
        for _ in range(64):
            for b, audio, fin in mux.step():
                (outA if b == hA else outB).append(audio)
                if fin:
                    if b == hA:
                        doneA = True
                    else:
                        doneB = True
            if doneA and doneB:
                break
        assert doneA and doneB
        gotA = np.concatenate(outA)
        gotB = np.concatenate(outB)
        wantA, _ = solo_audio(params, config, wg_small, kA, 0, idsA,
                              12, thr)
        wantB, _ = solo_audio(params, config, wg_small, kB, 1, idsB,
                              12, thr)
        np.testing.assert_allclose(gotA, wantA, atol=2e-4)
        np.testing.assert_allclose(gotB, wantB, atol=2e-4)

    def test_slot_reuse_after_finish(self, model1, wg_small):
        """A slot freed by a finished stream can host a new stream whose
        output is unpolluted by its predecessor (carry reset)."""
        params, config = model1
        rng = np.random.default_rng(2)
        thr = 0.35
        k1, k2 = jax.random.PRNGKey(30), jax.random.PRNGKey(31)
        ids1 = rng.integers(1, 185, (5,))
        ids2 = rng.integers(1, 185, (7,))

        mux = make_mux(params, config, wg_small, slots=1,
                       gate_threshold=thr)
        h1 = mux.open(k1, 0, ids1)
        got1 = drain(mux, [h1])[h1]
        h2 = mux.open(k2, 1, ids2)   # reuses the same physical slot
        got2 = drain(mux, [h2])[h2]

        want1, _ = solo_audio(params, config, wg_small, k1, 0, ids1,
                              12, thr)
        want2, _ = solo_audio(params, config, wg_small, k2, 1, ids2,
                              12, thr)
        np.testing.assert_allclose(got1, want1, atol=2e-4)
        np.testing.assert_allclose(got2, want2, atol=2e-4)

    def test_mux_full_and_close(self, model1, wg_small):
        params, config = model1
        rng = np.random.default_rng(3)
        mux = make_mux(params, config, wg_small, slots=2,
                       gate_threshold=0.55)   # high: streams stay live
        h = [mux.open(jax.random.PRNGKey(40 + i), 0,
                      rng.integers(1, 185, (5,))) for i in range(2)]
        with pytest.raises(MuxFull):
            mux.open(jax.random.PRNGKey(99), 0,
                     rng.integers(1, 185, (5,)))
        mux.close(h[0])
        mux.step()                   # close takes effect on the tick
        assert mux.active == 1
        # the freed slot accepts a new stream
        mux.open(jax.random.PRNGKey(43), 0, rng.integers(1, 185, (5,)))
        assert mux.active == 2

    def test_text_too_long_rejected(self, model1, wg_small):
        params, config = model1
        mux = make_mux(params, config, wg_small, slots=1,
                       gate_threshold=0.35, Tk=8)
        with pytest.raises(ValueError):
            mux.open(jax.random.PRNGKey(0), 0, np.ones((9,), np.int64))


class TestMux2Flow:
    def test_matches_solo_two_stage(self, model2, wg_small):
        """Flagship topology: per-slot B=1 prelude (gated backward
        flow) + batched streamed flow 0 == the solo two-stage run."""
        params, config = model2
        rng = np.random.default_rng(4)
        thr = 0.35
        streams = [
            (jax.random.PRNGKey(50 + i), i % 2,
             rng.integers(1, 185, (5 + i,)))
            for i in range(2)
        ]
        mux = make_mux(params, config, wg_small, slots=2,
                       gate_threshold=thr)
        handles = [mux.open(k, sid, ids) for k, sid, ids in streams]
        # 2-flow n_valid is known at open() (prelude ran)
        for h in handles:
            assert mux.n_valid_of(h) is not None
        got = drain(mux, handles)
        for h, (k, sid, ids) in zip(handles, streams):
            want, nv = solo_audio(params, config, wg_small, k, sid,
                                  ids, 12, thr)
            assert got[h].shape == want.shape
            np.testing.assert_allclose(got[h], want, atol=2e-4)

    def test_per_slot_temperature(self, model2, wg_small):
        """Per-slot temperatures ((B, 1) through the scan) don't leak
        across slots: a hot slot and a default slot each match their
        solo runs at their own temperature."""
        params, config = model2
        rng = np.random.default_rng(5)
        thr = 0.55   # high threshold: streams run long enough for the
        #              temperature's effect to accumulate through the
        #              AR recurrence (it only perturbs the attention)
        ids = rng.integers(1, 185, (6,))
        k = jax.random.PRNGKey(60)
        wg_params, wg_cfg = wg_small

        mux = make_mux(params, config, wg_small, slots=2,
                       gate_threshold=thr)
        h_hot = mux.open(k, 0, ids, temperature=1.7)
        h_std = mux.open(k, 0, ids, temperature=1.0)
        got = drain(mux, [h_hot, h_std])

        def solo_at(temp):
            k_mel, k_voc = jax.random.split(k)
            mel_s = StreamingMelSynthesizer(
                params, config, chunk_frames=GEO["chunk_frames"],
                gate_threshold=thr, max_frames=MAXF,
                temperature=temp)
            voc = StreamingVocoder(wg_params, wg_cfg, k_voc, sigma=0.8,
                                   context=GEO["context"],
                                   lookahead=GEO["lookahead"])
            text = np.zeros((1, 12), np.int64)
            text[0, :len(ids)] = ids
            return np.concatenate([
                np.asarray(c)[0] for c in pump_stream(
                    mel_s, voc, k_mel, jnp.zeros((1,), jnp.int32),
                    jnp.asarray(text), sigma=0.5,
                    in_lens=jnp.asarray([len(ids)]))])

        np.testing.assert_allclose(got[h_hot], solo_at(1.7), atol=2e-4)
        np.testing.assert_allclose(got[h_std], solo_at(1.0), atol=2e-4)
        if got[h_hot].shape == got[h_std].shape:
            # any nonzero difference proves the per-slot temperature
            # reached each lane: the two slots share key/text/sigma, so
            # identical temperatures would compute bitwise-equal audio
            # (measured: ~1.5e-6 through the 0.05-scale test vocoder)
            assert np.abs(got[h_hot] - got[h_std]).max() > 0


class TestJoinAdmission:
    """Staggered join admission (max_joins_per_tick=K): a rush of
    open()s must commit at most K device-side joins per tick, in
    arrival order, without changing any stream's audio (join timing is
    scheduling; each slot's output is a pure function of its key)."""

    def test_rush_commits_k_per_tick_same_audio(self, model1, wg_small):
        params, config = model1
        wg_params, wg_cfg = wg_small
        rng = np.random.default_rng(6)
        thr = 0.55   # streams stay live across several ticks
        streams = [
            (jax.random.PRNGKey(10 + i), i % 2,
             rng.integers(1, 185, (4 + 2 * i,)))
            for i in range(3)
        ]
        mux = MultiStreamTTS(params, config, wg_params, wg_cfg,
                             slots=4, text_len=12, max_frames=MAXF,
                             gate_threshold=thr, max_joins_per_tick=1,
                             **GEO)
        handles = [mux.open(k, sid, ids) for k, sid, ids in streams]

        def joined():
            with mux._lock:
                return sum(s is not None and s.joined
                           for s in mux._slots)

        # open() deferred everything: slots reserved, none committed
        assert mux.active == 3 and joined() == 0
        out = {h: [] for h in handles}
        done = set()
        expect = 0
        for tick in range(64):
            events = mux.step()
            for h, audio, fin in events:
                out[h].append(audio)
                if fin:
                    done.add(h)
            if expect < 3:
                expect += 1        # exactly one more join per tick
                assert joined() + len(done) == expect, tick
            if done >= set(handles):
                break
        assert done >= set(handles)

        # admission changed scheduling only: audio == the solo runs
        # (same oracle as test_matches_solo_streams_ragged_gates)
        for h, (k, sid, ids) in zip(handles, streams):
            want, _ = solo_audio(params, config, wg_small, k, sid,
                                 ids, 12, thr)
            got = np.concatenate(out[h]) if out[h] else \
                np.zeros((0,), np.float32)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=2e-4)

    def test_close_before_commit_frees_slot(self, model1, wg_small):
        params, config = model1
        wg_params, wg_cfg = wg_small
        rng = np.random.default_rng(7)
        mux = MultiStreamTTS(params, config, wg_params, wg_cfg,
                             slots=2, text_len=12, max_frames=MAXF,
                             gate_threshold=0.55,
                             max_joins_per_tick=1, **GEO)
        hA = mux.open(jax.random.PRNGKey(1), 0,
                      rng.integers(1, 185, (5,)))
        hB = mux.open(jax.random.PRNGKey(2), 1,
                      rng.integers(1, 185, (6,)))
        mux.close(hB)              # before its join ever committed
        seen = set()
        for _ in range(3):
            for h, _a, _d in mux.step():
                seen.add(h)
        assert hB not in seen      # never emitted
        assert hA in seen          # A committed and runs
        assert mux.active == 1     # B's slot was freed, not leaked
        hC = mux.open(jax.random.PRNGKey(3), 0,
                      rng.integers(1, 185, (4,)))
        mux.step()
        assert mux.active == 2     # freed slot is reusable


class TestMuxBf16:
    def test_bf16_mux_matches_bf16_solo(self, model1, wg_small):
        """The serving engines run bf16: the mux must keep the compute
        dtype stable (an f32 per-slot sigma/temperature buffer must not
        promote the scan carry — the B=1 path's Python-float controls
        stay weakly typed) and match the bf16 solo pipeline."""
        params, config = model1
        wg_params, wg_cfg = wg_small

        def cast(t):
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x, t)

        p16, wg16 = cast(params), cast(wg_params)
        rng = np.random.default_rng(9)
        ids = rng.integers(1, 185, (6,))
        k = jax.random.PRNGKey(80)
        mux = MultiStreamTTS(p16, config, wg16, wg_cfg, slots=2,
                             text_len=12, max_frames=MAXF,
                             gate_threshold=0.55, **GEO)
        h = mux.open(k, 0, ids)
        got = drain(mux, [h])[h]
        want, _ = solo_audio(p16, config, (wg16, wg_cfg), k, 0, ids,
                             12, 0.55, dtype=jnp.bfloat16)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-2)  # bf16 noise
