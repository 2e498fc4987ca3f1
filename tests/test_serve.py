"""Serving engine tests: request batching, padding buckets, error paths.

Exercises SynthesisEngine directly (no HTTP) on a tiny model + corpus.
"""

import os
import threading

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from scipy.io import wavfile


@pytest.fixture(scope="module")
def engine(tmp_path_factory, ):
    import jax
    from flowtron_tpu.models import flowtron_init
    from flowtron_tpu.train.checkpoints import save_checkpoint
    from flowtron_tpu.train.radam import radam
    from flowtron_tpu.serve import SynthesisEngine

    root = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    # one-utterance corpus for the frontend speaker table
    wav = (rng.standard_normal(4096) * 2000).astype(np.int16)
    wavfile.write(root / "u.wav", 22050, wav)
    (root / "fl.txt").write_text(f"{root}/u.wav|hello|0\n")

    small = dict(n_speakers=1, n_speaker_dim=4, n_text=185, n_text_dim=16,
                 n_mel_channels=8, n_hidden=12, n_attn_channels=8,
                 n_lstm_layers=2, mel_encoder_n_hidden=8)
    params, _ = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                              use_gate_layer=True, **small)
    ckpt = str(root / "model")
    save_checkpoint(ckpt, params, radam(1e-3).init(params), 0, 1e-3)

    from flowtron_tpu.config import load_config
    config = load_config(overrides=[
        f"data_config.training_files={root}/fl.txt",
        f"data_config.validation_files={root}/fl.txt",
        "data_config.p_arpabet=0.0",
        "data_config.cmudict_path=",
        "data_config.heteronyms_path=",
        "data_config.use_attn_prior=False",
    ])
    config["model_config"] = dict(small, n_flows=2, use_gate_layer=True)
    return SynthesisEngine(config, ckpt, max_batch=4, batch_timeout_ms=50,
                           text_buckets=(16, 32), n_frames=6)


class TestEngine:
    def test_single_request(self, engine):
        wav, sr = engine.submit("Hello there.", 0)
        assert sr == 22050
        assert wav.dtype == np.int16
        assert len(wav) > 0

    def test_concurrent_requests_batched(self, engine):
        results = {}

        def req(i):
            results[i] = engine.submit(f"Request number {i}.", 0, seed=i)

        threads = [threading.Thread(target=req, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 3
        # different seeds -> different audio
        assert not np.array_equal(results[0][0], results[1][0])

    def test_empty_text_errors(self, engine):
        with pytest.raises(ValueError, match="empty text"):
            engine.submit("~~~", 0)   # cleans to symbols dropped -> empty

    def test_long_text_rejected_not_truncated(self, engine):
        """Text past the largest bucket raises TextTooLong (-> HTTP 413)
        instead of silently returning audio for a prefix."""
        from flowtron_tpu.serve import TextTooLong
        with pytest.raises(TextTooLong, match="largest bucket"):
            engine.submit("word " * 50, 0)  # exceeds largest bucket
        assert engine.metrics()["rejected_too_long"] >= 1

    def test_long_text_split_synthesizes_all(self, engine):
        """split=True sentence-splits server-side; segments coalesce
        into one micro-batch and the audio is concatenated."""
        long_text = "One two three. " * 8  # 8 sentences, 2 fit per bucket
        wav, sr = engine.submit(long_text, 0, split=True)
        # 4 segments x >= 1 frame (256 samples) each, concatenated
        assert len(wav) >= 4 * 256

    def test_completion_failure_fails_only_that_batch(self, engine):
        """The pipelined dispatch/completion split: an error in the
        completion stage fails the affected requests and the engine
        keeps serving."""
        orig = engine._complete_batch
        calls = {"n": 0}

        def boom(batch, handles):
            if calls["n"] == 0:
                calls["n"] += 1
                raise RuntimeError("completion exploded")
            return orig(batch, handles)

        engine._complete_batch = boom
        try:
            with pytest.raises(RuntimeError, match="completion exploded"):
                engine.submit("Hello.", 0)
        finally:
            engine._complete_batch = orig
        wav, _ = engine.submit("Hello again.", 0)
        assert len(wav) > 0

    def test_overload_raises_429(self, engine):
        """A full request queue rejects instead of queueing unboundedly.
        The worker is blocked on the ORIGINAL queue object, so swapping
        in a pre-filled one makes the test deterministic."""
        import queue as _q
        from flowtron_tpu.serve import EngineOverloaded
        old = engine._queue
        try:
            full = _q.Queue(maxsize=1)
            full.put_nowait(None)  # never consumed: worker reads `old`
            engine._queue = full
            with pytest.raises(EngineOverloaded, match="queue full"):
                engine.submit("Hello.", 0)
        finally:
            engine._queue = old
        assert engine.metrics()["rejected_overload"] >= 1



def test_split_measured_packs_sentences():
    from flowtron_tpu.serve import split_measured, TextTooLong

    def measure(s):
        return list(s)  # one id per char, deterministic

    segs = split_measured("Aa bb. Cc dd! Ee ff? Gg hh.", measure, 14)
    assert [s for s, _ in segs] == ["Aa bb. Cc dd!", "Ee ff? Gg hh."]
    assert all(len(ids) <= 14 for _, ids in segs)
    # an over-long single sentence falls back to word bisection
    segs = split_measured("aaaa bbbb cccc dddd", measure, 9)
    assert [s for s, _ in segs] == ["aaaa bbbb", "cccc dddd"]
    # a single over-long word cannot fit any bucket
    with pytest.raises(TextTooLong):
        split_measured("superlongword", measure, 5)


def test_split_measured_stochastic_measure_never_overflows():
    """The frontend is stochastic at 0<p_arpabet<1: segments must use
    the ids they were measured with, and every returned piece fits."""
    from flowtron_tpu.serve import split_measured
    rng = np.random.default_rng(0)

    def measure(s):  # random per-call inflation, like arpabet rolls
        return list(s) + [0] * rng.integers(0, 4)

    text = ". ".join(["word one two", "three four five", "six seven",
                      "eight nine ten"] * 3) + "."
    for _ in range(10):
        for seg, ids in split_measured(text, measure, 20):
            assert len(ids) <= 20, (seg, len(ids))


@pytest.fixture(scope="module")
def stream_engine(tmp_path_factory):
    """1-flow model + tiny vocoder: the streaming serving path."""
    import jax
    import pickle
    from flowtron_tpu.models import flowtron_init
    from flowtron_tpu.train.checkpoints import save_checkpoint
    from flowtron_tpu.train.radam import radam
    from flowtron_tpu.vocoder import waveglow_init
    from flowtron_tpu.serve import SynthesisEngine

    root = tmp_path_factory.mktemp("stream_serve")
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(4096) * 2000).astype(np.int16)
    wavfile.write(root / "u.wav", 22050, wav)
    (root / "fl.txt").write_text(f"{root}/u.wav|hello|0\n")

    small = dict(n_speakers=1, n_speaker_dim=4, n_text=185, n_text_dim=16,
                 n_mel_channels=8, n_hidden=12, n_attn_channels=8,
                 n_lstm_layers=2, mel_encoder_n_hidden=8)
    params, _ = flowtron_init(jax.random.PRNGKey(0), n_flows=1,
                              use_gate_layer=True, **small)
    # non-identity coupling so controls (temperature) affect the mel
    f = params["flows"][0]
    f["conv"]["w"] = 0.05 * jax.random.normal(jax.random.PRNGKey(2),
                                              f["conv"]["w"].shape)
    ckpt = str(root / "model")
    save_checkpoint(ckpt, params, radam(1e-3).init(params), 0, 1e-3)

    wgp, wgc = waveglow_init(jax.random.PRNGKey(1), n_mel_channels=8,
                             n_flows=4, n_group=8, n_early_every=2,
                             n_early_size=2, n_layers=3, n_channels=16)
    # perturb the zero-init coupling end convs so the vocoder's audio
    # actually depends on the mel (identity couplings ignore it),
    # letting tests witness mel-side controls at the audio level
    for wn in wgp["wn"]:
        wn["end"]["w"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(3), wn["end"]["w"].shape)
    wg_path = str(root / "wg.pkl")
    with open(wg_path, "wb") as f:
        pickle.dump({"params": wgp, "config": wgc}, f)

    from flowtron_tpu.config import load_config
    config = load_config(overrides=[
        f"data_config.training_files={root}/fl.txt",
        f"data_config.validation_files={root}/fl.txt",
        "data_config.p_arpabet=0.0",
        "data_config.cmudict_path=",
        "data_config.heteronyms_path=",
        "data_config.use_attn_prior=False",
    ])
    config["model_config"] = dict(small, n_flows=1, use_gate_layer=True)
    return SynthesisEngine(config, ckpt, waveglow_path=wg_path,
                           max_batch=2, batch_timeout_ms=20,
                           text_buckets=(16, 32), n_frames=48)


class TestStreamingEngine:
    def test_can_stream(self, stream_engine, engine):
        assert stream_engine.can_stream
        assert not engine.can_stream  # 2-flow model, no vocoder

    def test_stream_produces_pcm(self, stream_engine):
        chunks = list(stream_engine.stream("Hello there.", 0, seed=7))
        assert chunks, "no chunks"
        wav = np.concatenate(chunks)
        assert wav.dtype == np.int16
        assert len(wav) % 256 == 0
        assert len(wav) >= 256

    def test_stream_long_text_rejected_without_split(self, stream_engine):
        from flowtron_tpu.serve import TextTooLong
        with pytest.raises(TextTooLong, match="largest bucket"):
            stream_engine.stream("word " * 20, 0)

    def test_stream_split_streams_whole_paragraph(self, stream_engine):
        """split=True: paragraph-length text streams as one continuous
        PCM stream, every sentence-split segment contributing audio on
        the same checked-out streamer."""
        from flowtron_tpu.serve import split_measured
        text = "One two three. " * 6
        pieces = split_measured(text, stream_engine.frontend.get_text,
                                stream_engine.text_buckets[-1])
        assert len(pieces) >= 2  # actually exercises multi-segment
        chunks = list(stream_engine.stream(text, 0, seed=5, split=True))
        wav = np.concatenate(chunks)
        assert len(wav) >= len(pieces) * 256  # >=1 frame per segment
        assert np.isfinite(wav.astype(np.float64)).all()

    def test_stream_seed_changes_audio(self, stream_engine):
        a = np.concatenate(list(stream_engine.stream("Same text.", 0,
                                                     seed=1)))
        b = np.concatenate(list(stream_engine.stream("Same text.", 0,
                                                     seed=2)))
        n = min(len(a), len(b))
        assert not np.array_equal(a[:n], b[:n])

    def test_stream_reentrant_after_reset(self, stream_engine):
        a = np.concatenate(list(stream_engine.stream("One.", 0, seed=3)))
        b = np.concatenate(list(stream_engine.stream("One.", 0, seed=3)))
        # same seed + same text through the warm streamers -> identical
        np.testing.assert_array_equal(a, b)

    def test_stream_abandoned_mid_way_releases_lock(self, stream_engine):
        """A client disconnect closes the generator; the next stream
        request must not deadlock on the streamer lock."""
        gen = stream_engine.stream("A sentence to abandon.", 0, seed=4)
        next(gen)
        gen.close()
        out = np.concatenate(list(stream_engine.stream("Recovered.", 0,
                                                       seed=5)))
        assert len(out) > 0

    def test_stalled_consumer_releases_streamers(self, stream_engine):
        """A consumer that stops draining (dead client socket) must not
        pin the shared streamers: the producer aborts after
        stream_stall_timeout and the next request proceeds."""
        import time
        old = stream_engine.stream_stall_timeout
        stream_engine.stream_stall_timeout = 0.2
        try:
            gen = stream_engine.stream("A long enough stall sentence.",
                                       0, seed=6)
            next(gen)          # producer running, consumer now stalls
            time.sleep(1.0)    # > stall timeout: producer aborts
            out = np.concatenate(list(stream_engine.stream(
                "After the stall.", 0, seed=7)))
            assert len(out) > 0
            gen.close()
        finally:
            stream_engine.stream_stall_timeout = old

    def test_per_request_n_frames_caps_output(self, stream_engine):
        full, _ = stream_engine.submit("Hello there again.", 0, seed=11)
        capped, _ = stream_engine.submit("Hello there again.", 0, seed=11,
                                         n_frames=1)
        assert len(capped) == 256  # exactly the 1-frame cap
        assert len(full) >= len(capped)

    def test_per_request_temperature(self, stream_engine):
        """Per-request temperature changes the audio END TO END through
        the one-dispatch serving path (the fixture's vocoder couplings
        are perturbed off identity so audio witnesses the mel)."""
        a, _ = stream_engine.submit("Hello there.", 0, seed=12)
        b, _ = stream_engine.submit("Hello there.", 0, seed=12,
                                    temperature=4.0)
        n = min(len(a), len(b))
        assert n > 0
        assert not np.array_equal(a[:n], b[:n])


@pytest.fixture(scope="module")
def replica_engine(stream_engine, tmp_path_factory):
    """Same tiny 1-flow model + vocoder as stream_engine, but served as
    TWO data-parallel replicas on the 8-virtual-device CPU platform."""
    from flowtron_tpu.serve import SynthesisEngine
    # rebuild from the stream_engine's on-disk artifacts: the fixtures
    # wrote them under the same tmp root recorded in the data config
    cfg = stream_engine.config
    ckpt = stream_engine._ckpt_path
    wg_path = stream_engine._waveglow_path
    return SynthesisEngine(cfg, ckpt, waveglow_path=wg_path,
                           max_batch=2, batch_timeout_ms=20,
                           text_buckets=(16, 32), n_frames=48,
                           replicas=2, stream_workers=2)


class TestReplicas:
    def test_two_devices_used(self, replica_engine):
        import jax
        assert len(jax.local_devices()) >= 2  # conftest forces 8
        assert replica_engine._n_replicas == 2
        for i in range(3):  # sequential -> one batch each, round-robin
            wav, sr = replica_engine.submit(f"Request {i}.", 0, seed=i)
            assert len(wav) > 0
        counts = replica_engine.metrics()["replica_batches"]
        assert len(counts) == 2
        assert all(c > 0 for c in counts), counts

    def test_replica_matches_single_device(self, replica_engine,
                                           stream_engine):
        """Both replicas run the identical program: the same request
        submitted repeatedly (landing on alternating replicas) matches
        itself AND the single-device engine bitwise."""
        ref, _ = stream_engine.submit("Parity text.", 0, seed=9)
        a, _ = replica_engine.submit("Parity text.", 0, seed=9)
        b, _ = replica_engine.submit("Parity text.", 0, seed=9)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, ref)

    def test_replicas_clamped_to_device_count(self, stream_engine):
        from flowtron_tpu.serve import SynthesisEngine
        eng = SynthesisEngine(stream_engine.config,
                              stream_engine._ckpt_path,
                              max_batch=2, batch_timeout_ms=20,
                              text_buckets=(16, 32), n_frames=8,
                              replicas=64)
        import jax
        assert eng._n_replicas == len(jax.local_devices())
        # no vocoder -> this also exercises the Griffin-Lim replica
        # path (latents hop from the default device to the replica's)
        wav, _ = eng.submit("Hello.", 0)
        assert len(wav) > 0

    def test_stream_on_replica_engine(self, replica_engine):
        """Streamer pairs are spread across replica devices; both
        concurrent streams produce audio."""
        import jax
        # BOTH halves of each pair follow their replica's device — the
        # vocoder must not stay committed to the base device (regression:
        # wg_i was computed but wg_params passed)
        pairs = list(replica_engine._stream_pool.queue)
        devs = set()
        for mel_s, voc in pairs:
            leaf = jax.tree_util.tree_leaves(voc.params)[0]
            devs.add(next(iter(leaf.devices())))
        assert devs == set(replica_engine._replica_devices[:len(pairs)])
        outs = {}

        def run(i):
            outs[i] = np.concatenate(list(
                replica_engine.stream(f"Stream {i}.", 0, seed=20 + i)))

        ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert all(len(v) > 0 for v in outs.values())

    def test_concurrent_streams_via_pool(self, stream_engine):
        """With the streamer pool (default 2 pairs), a second stream
        completes WHILE the first is still open — the old single-pair
        lock serialized them."""
        gen_a = stream_engine.stream("First concurrent stream.", 0,
                                     seed=20)
        next(gen_a)  # A holds a pair mid-stream
        try:
            out_b = np.concatenate(list(stream_engine.stream(
                "Second concurrent stream.", 0, seed=21)))
            assert len(out_b) > 0
        finally:
            gen_a.close()
        # pool fully restored: two more sequential streams succeed
        for seed in (22, 23):
            out = np.concatenate(list(stream_engine.stream(
                "Pool restored.", 0, seed=seed)))
            assert len(out) > 0

    def test_stream_pool_exhaustion_raises_overloaded(self,
                                                      tmp_path_factory):
        """stream_workers=1: a second stream while one is open must
        fail fast with EngineOverloaded (-> HTTP 429), not block the
        handler forever."""
        import jax
        import pickle
        from flowtron_tpu.models import flowtron_init
        from flowtron_tpu.train.checkpoints import save_checkpoint
        from flowtron_tpu.train.radam import radam
        from flowtron_tpu.vocoder import waveglow_init
        from flowtron_tpu.serve import SynthesisEngine, EngineOverloaded

        root = tmp_path_factory.mktemp("pool1")
        rng = np.random.default_rng(0)
        wavfile.write(root / "u.wav", 22050,
                      (rng.standard_normal(4096) * 2000).astype(np.int16))
        (root / "fl.txt").write_text(f"{root}/u.wav|hello|0\n")
        small = dict(n_speakers=1, n_speaker_dim=4, n_text=185,
                     n_text_dim=16, n_mel_channels=8, n_hidden=12,
                     n_attn_channels=8, n_lstm_layers=2,
                     mel_encoder_n_hidden=8)
        params, _ = flowtron_init(jax.random.PRNGKey(0), n_flows=1,
                                  use_gate_layer=True, **small)
        import jax.numpy as jnp
        # gate never fires: stream A must still be mid-utterance (its
        # producer blocked on the full hand-off queue, pair held) when
        # stream B asks for a worker
        params["flows"][0]["gate_layer"]["b"] = jnp.asarray([-50.0])
        ckpt = str(root / "model")
        save_checkpoint(ckpt, params, radam(1e-3).init(params), 0, 1e-3)
        wgp, wgc = waveglow_init(jax.random.PRNGKey(1), n_mel_channels=8,
                                 n_flows=4, n_group=8, n_early_every=2,
                                 n_early_size=2, n_layers=3,
                                 n_channels=16)
        with open(root / "wg.pkl", "wb") as f:
            pickle.dump({"params": wgp, "config": wgc}, f)
        from flowtron_tpu.config import load_config
        config = load_config(overrides=[
            f"data_config.training_files={root}/fl.txt",
            f"data_config.validation_files={root}/fl.txt",
            "data_config.p_arpabet=0.0",
            "data_config.cmudict_path=",
            "data_config.heteronyms_path=",
            "data_config.use_attn_prior=False",
        ])
        config["model_config"] = dict(small, n_flows=1,
                                      use_gate_layer=True)
        eng = SynthesisEngine(config, ckpt,
                              waveglow_path=str(root / "wg.pkl"),
                              max_batch=2, batch_timeout_ms=20,
                              text_buckets=(16,), n_frames=400,
                              stream_workers=1,
                              stream_stall_timeout=30.0,
                              stream_acquire_timeout=0.5)
        gen_a = eng.stream("Hold me please.", 0, seed=1)
        next(gen_a)
        try:
            with pytest.raises(EngineOverloaded, match="workers busy"):
                eng.stream("No worker free.", 0, seed=2)
        finally:
            gen_a.close()
        # pair returned after close: streaming works again
        out = np.concatenate(list(eng.stream("Free again.", 0, seed=3)))
        assert len(out) > 0

    def test_stream_per_request_n_frames(self, stream_engine):
        chunks = list(stream_engine.stream("Cap the stream.", 0, seed=8,
                                           n_frames=3))
        wav = np.concatenate(chunks)
        assert 256 <= len(wav) <= 3 * 256


class TestFusedServing:
    def test_fused_engine_synthesize(self, tmp_path_factory):
        """--fused engines dispatch the Pallas decoder (interpret mode
        off-TPU) and must still serve; with --mesh it is auto-disabled
        (incompatible: VMEM-resident kernel vs TP-sharded weights)."""
        import jax
        from flowtron_tpu.models import flowtron_init
        from flowtron_tpu.train.checkpoints import save_checkpoint
        from flowtron_tpu.train.radam import radam
        from flowtron_tpu.serve import SynthesisEngine

        root = tmp_path_factory.mktemp("fused_serve")
        rng = np.random.default_rng(0)
        wavfile.write(root / "u.wav", 22050,
                      (rng.standard_normal(4096) * 2000).astype(np.int16))
        (root / "fl.txt").write_text(f"{root}/u.wav|hello|0\n")
        small = dict(n_speakers=1, n_speaker_dim=4, n_text=185,
                     n_text_dim=16, n_mel_channels=8, n_hidden=16,
                     n_attn_channels=8, n_lstm_layers=2,
                     mel_encoder_n_hidden=8)
        params, _ = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                  use_gate_layer=True, **small)
        ckpt = str(root / "model")
        save_checkpoint(ckpt, params, radam(1e-3).init(params), 0, 1e-3)

        from flowtron_tpu.config import load_config
        config = load_config(overrides=[
            f"data_config.training_files={root}/fl.txt",
            f"data_config.validation_files={root}/fl.txt",
            "data_config.p_arpabet=0.0",
            "data_config.cmudict_path=",
            "data_config.heteronyms_path=",
            "data_config.use_attn_prior=False",
        ])
        config["model_config"] = dict(small, n_flows=2,
                                      use_gate_layer=True)
        eng = SynthesisEngine(config, ckpt, max_batch=2,
                              batch_timeout_ms=20, text_buckets=(16,),
                              n_frames=4, fused=True)
        wav, sr = eng.submit("Hi.", 0)
        assert len(wav) > 0 and np.isfinite(wav.astype(np.float64)).all()


class TestMeshServing:
    def test_tp_mesh_engine(self, tmp_path_factory):
        """Engine on a (2 data x 4 model) mesh: weights TP-sharded,
        odd-sized request batches padded to the data axis."""
        import jax
        from flowtron_tpu.models import flowtron_init
        from flowtron_tpu.train.checkpoints import save_checkpoint
        from flowtron_tpu.train.radam import radam
        from flowtron_tpu.serve import SynthesisEngine

        root = tmp_path_factory.mktemp("mesh_serve")
        rng = np.random.default_rng(0)
        wavfile.write(root / "u.wav", 22050,
                      (rng.standard_normal(4096) * 2000).astype(np.int16))
        (root / "fl.txt").write_text(f"{root}/u.wav|hello|0\n")
        small = dict(n_speakers=1, n_speaker_dim=4, n_text=185,
                     n_text_dim=16, n_mel_channels=8, n_hidden=16,
                     n_attn_channels=8, n_lstm_layers=2,
                     mel_encoder_n_hidden=8)
        params, _ = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                  use_gate_layer=True, **small)
        ckpt = str(root / "model")
        save_checkpoint(ckpt, params, radam(1e-3).init(params), 0, 1e-3)

        from flowtron_tpu.config import load_config
        config = load_config(overrides=[
            f"data_config.training_files={root}/fl.txt",
            f"data_config.validation_files={root}/fl.txt",
            "data_config.p_arpabet=0.0",
            "data_config.cmudict_path=",
            "data_config.heteronyms_path=",
            "data_config.use_attn_prior=False",
        ])
        config["model_config"] = dict(small, n_flows=2,
                                      use_gate_layer=True)
        eng = SynthesisEngine(config, ckpt, max_batch=4,
                              batch_timeout_ms=20, text_buckets=(16,),
                              n_frames=6, mesh_shape=(2, 4))
        wav, sr = eng.submit("Hello mesh.", 0)  # B=1 -> padded to 2
        assert sr == 22050 and len(wav) > 0
        assert np.isfinite(wav.astype(np.float64)).all()

    def test_tp_mesh_engine_with_vocoder(self, tmp_path_factory):
        """Mesh + neural vocoder: the fused synth_vocode dispatch needs
        the (single-device-committed) WaveGlow params replicated onto
        the mesh — this path had no coverage and regressed once."""
        import jax
        import pickle
        from flowtron_tpu.models import flowtron_init
        from flowtron_tpu.train.checkpoints import save_checkpoint
        from flowtron_tpu.train.radam import radam
        from flowtron_tpu.vocoder import waveglow_init
        from flowtron_tpu.serve import SynthesisEngine

        root = tmp_path_factory.mktemp("mesh_wg_serve")
        rng = np.random.default_rng(0)
        wavfile.write(root / "u.wav", 22050,
                      (rng.standard_normal(4096) * 2000).astype(np.int16))
        (root / "fl.txt").write_text(f"{root}/u.wav|hello|0\n")
        small = dict(n_speakers=1, n_speaker_dim=4, n_text=185,
                     n_text_dim=16, n_mel_channels=8, n_hidden=16,
                     n_attn_channels=8, n_lstm_layers=2,
                     mel_encoder_n_hidden=8)
        params, _ = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                  use_gate_layer=True, **small)
        ckpt = str(root / "model")
        save_checkpoint(ckpt, params, radam(1e-3).init(params), 0, 1e-3)
        wgp, wgc = waveglow_init(jax.random.PRNGKey(1), n_mel_channels=8,
                                 n_flows=4, n_group=8, n_early_every=2,
                                 n_early_size=2, n_layers=3,
                                 n_channels=16)
        with open(root / "wg.pkl", "wb") as f:
            pickle.dump({"params": wgp, "config": wgc}, f)

        from flowtron_tpu.config import load_config
        config = load_config(overrides=[
            f"data_config.training_files={root}/fl.txt",
            f"data_config.validation_files={root}/fl.txt",
            "data_config.p_arpabet=0.0",
            "data_config.cmudict_path=",
            "data_config.heteronyms_path=",
            "data_config.use_attn_prior=False",
        ])
        config["model_config"] = dict(small, n_flows=2,
                                      use_gate_layer=True)
        eng = SynthesisEngine(config, ckpt,
                              waveglow_path=str(root / "wg.pkl"),
                              max_batch=4, batch_timeout_ms=20,
                              text_buckets=(16,), n_frames=8,
                              mesh_shape=(2, 4), bf16=True)
        wav, sr = eng.submit("Hello mesh.", 0)
        assert sr == 22050 and len(wav) > 0
        assert np.isfinite(wav.astype(np.float64)).all()


class TestBf16Serving:
    def test_bf16_engine_synthesize_and_stream(self, tmp_path_factory):
        """--bf16: weights/latents in bfloat16 through both the batch
        path and the streaming path; finite audio out."""
        import jax
        import pickle
        from flowtron_tpu.models import flowtron_init
        from flowtron_tpu.train.checkpoints import save_checkpoint
        from flowtron_tpu.train.radam import radam
        from flowtron_tpu.vocoder import waveglow_init
        from flowtron_tpu.serve import SynthesisEngine

        root = tmp_path_factory.mktemp("bf16_serve")
        rng = np.random.default_rng(0)
        wavfile.write(root / "u.wav", 22050,
                      (rng.standard_normal(4096) * 2000).astype(np.int16))
        (root / "fl.txt").write_text(f"{root}/u.wav|hello|0\n")
        small = dict(n_speakers=1, n_speaker_dim=4, n_text=185,
                     n_text_dim=16, n_mel_channels=8, n_hidden=12,
                     n_attn_channels=8, n_lstm_layers=2,
                     mel_encoder_n_hidden=8)
        params, _ = flowtron_init(jax.random.PRNGKey(0), n_flows=1,
                                  use_gate_layer=True, **small)
        ckpt = str(root / "model")
        save_checkpoint(ckpt, params, radam(1e-3).init(params), 0, 1e-3)
        wgp, wgc = waveglow_init(jax.random.PRNGKey(1), n_mel_channels=8,
                                 n_flows=4, n_group=8, n_early_every=2,
                                 n_early_size=2, n_layers=3, n_channels=16)
        with open(root / "wg.pkl", "wb") as f:
            pickle.dump({"params": wgp, "config": wgc}, f)

        from flowtron_tpu.config import load_config
        config = load_config(overrides=[
            f"data_config.training_files={root}/fl.txt",
            f"data_config.validation_files={root}/fl.txt",
            "data_config.p_arpabet=0.0",
            "data_config.cmudict_path=",
            "data_config.heteronyms_path=",
            "data_config.use_attn_prior=False",
        ])
        config["model_config"] = dict(small, n_flows=1,
                                      use_gate_layer=True)
        eng = SynthesisEngine(config, ckpt, waveglow_path=str(root /
                                                             "wg.pkl"),
                              max_batch=2, batch_timeout_ms=20,
                              text_buckets=(16,), n_frames=24, bf16=True)
        wav, sr = eng.submit("Hello there.", 0)
        assert len(wav) > 0 and np.isfinite(wav.astype(np.float64)).all()
        chunks = list(eng.stream("Stream me.", 0, seed=2))
        out = np.concatenate(chunks)
        assert len(out) > 0 and np.isfinite(out.astype(np.float64)).all()

        # regression: bf16 composes with quantized modes (fp32 biases
        # used to leak into the bf16 scan carry -> carry-dtype mismatch
        # at first compile; caught live by the w8+bf16 load test)
        for qmode in ("w8", "w4"):
            engq = SynthesisEngine(config, ckpt,
                                   waveglow_path=str(root / "wg.pkl"),
                                   max_batch=2, batch_timeout_ms=20,
                                   text_buckets=(16,), n_frames=24,
                                   bf16=True, quantize=qmode)
            wav, _ = engq.submit("Hello there.", 0)
            assert len(wav) > 0
            assert np.isfinite(wav.astype(np.float64)).all()
            out = np.concatenate(list(engq.stream("Stream me.", 0,
                                                  seed=2)))
            assert len(out) > 0
            assert np.isfinite(out.astype(np.float64)).all()


class TestHTTPEndpoints:
    @pytest.fixture(scope="class")
    def server(self, stream_engine):
        from http.server import ThreadingHTTPServer
        from flowtron_tpu.serve import make_handler
        srv = ThreadingHTTPServer(("127.0.0.1", 0),
                                  make_handler(stream_engine))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    def _post(self, url, body, timeout=300):
        import json
        import urllib.request
        req = urllib.request.Request(
            url, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=timeout)

    def test_healthz(self, server):
        import json
        import urllib.request
        with urllib.request.urlopen(server + "/healthz", timeout=60) as r:
            assert json.loads(r.read())["status"] == "ok"

    def test_root_index(self, server):
        import json
        import urllib.request
        with urllib.request.urlopen(server + "/", timeout=60) as r:
            idx = json.loads(r.read())
        assert idx["service"] == "flowtron_tpu" and idx["version"]
        assert "POST /synthesize" in idx["endpoints"]
        assert "denoise" in idx["request_fields"]

    def test_synthesize_wav(self, server):
        with self._post(server + "/synthesize",
                        {"text": "Hello HTTP."}) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            body = r.read()
        assert body[:4] == b"RIFF"

    def test_stream_chunked_wav(self, server):
        with self._post(server + "/stream",
                        {"text": "Hello streaming HTTP.", "seed": 3}) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            assert r.headers.get("Transfer-Encoding") == "chunked"
            body = r.read()
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        pcm = np.frombuffer(body[44:], np.int16)
        assert len(pcm) > 0 and len(pcm) % 256 == 0

    def test_stream_empty_text_is_json_error(self, server):
        """Validation must fail BEFORE the 200/chunked headers."""
        import json
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(server + "/stream", {"text": "~~~"})
        assert ei.value.code == 400
        assert "empty text" in json.loads(ei.value.read())["error"]

    def test_missing_field_is_400(self, server):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(server + "/synthesize", {"speaker_id": 0})
        assert ei.value.code == 400

    def test_metrics_endpoint(self, server):
        import json
        import urllib.request
        # ensure at least one batch was served
        self._post(server + "/synthesize", {"text": "Count me."}).read()
        with urllib.request.urlopen(server + "/metrics", timeout=60) as r:
            m = json.loads(r.read())
        assert m["requests"] >= 1 and m["batches"] >= 1
        assert m["audio_seconds"] > 0
        assert "batch_ms_p50" in m

    def test_http_413_on_long_text(self, server):
        import json
        import urllib.error
        for path in ("/synthesize", "/stream"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                self._post(server + path, {"text": "word " * 60})
            assert ei.value.code == 413
            assert "largest bucket" in json.loads(ei.value.read())["error"]

    def test_http_413_on_oversized_body(self, server):
        """A client-declared multi-GB Content-Length is rejected with
        413 BEFORE the handler buffers anything (mirrors _WS_MAX_FRAME
        on the WebSocket path)."""
        import socket
        host, port = server.replace("http://", "").split(":")
        for path in ("/synthesize", "/stream", "/models", "/profile"):
            with socket.create_connection((host, int(port)),
                                          timeout=60) as s:
                s.sendall((f"POST {path} HTTP/1.1\r\n"
                           f"Host: {host}\r\n"
                           "Content-Type: application/json\r\n"
                           "Content-Length: 5000000000\r\n"
                           "Connection: close\r\n\r\n").encode())
                # no body follows: the 413 must arrive without it
                s.settimeout(60)
                status = s.makefile("rb").readline()
            assert b"413" in status, (path, status)

    def test_http_split_long_text(self, server):
        with self._post(server + "/synthesize",
                        {"text": "One two three. " * 8,
                         "split": True}) as r:
            body = r.read()
        assert body[:4] == b"RIFF"

    def test_http_stream_split_long_text(self, server):
        with self._post(server + "/stream",
                        {"text": "One two three. " * 6,
                         "split": True, "seed": 11}) as r:
            assert r.headers.get("Transfer-Encoding") == "chunked"
            body = r.read()
        assert body[:4] == b"RIFF"
        pcm = np.frombuffer(body[44:], np.int16)
        assert len(pcm) >= 2 * 256  # multiple segments' audio

    # -- WebSocket transport (hand-rolled RFC 6455 client) -------------
    def _ws_connect(self, server, body):
        import base64
        import json as _json
        import socket
        import struct
        from urllib.parse import urlparse
        u = urlparse(server)
        s = socket.create_connection((u.hostname, u.port), timeout=300)
        key = base64.b64encode(b"0123456789abcdef").decode()
        s.sendall((f"GET /stream-ws HTTP/1.1\r\nHost: {u.hostname}\r\n"
                   "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                   f"Sec-WebSocket-Key: {key}\r\n"
                   "Sec-WebSocket-Version: 13\r\n\r\n").encode())
        f = s.makefile("rb")
        status = f.readline()
        assert b"101" in status, status
        while f.readline() not in (b"\r\n", b""):
            pass

        def send_text(obj):
            payload = _json.dumps(obj).encode()
            mask = b"\x01\x02\x03\x04"
            masked = bytes(b ^ mask[i % 4]
                           for i, b in enumerate(payload))
            n = len(payload)
            head = b"\x81"  # FIN + text
            if n < 126:
                head += bytes([0x80 | n])
            else:
                head += bytes([0x80 | 126]) + struct.pack(">H", n)
            s.sendall(head + mask + masked)

        def recv():
            h = f.read(2)
            if len(h) < 2:
                return None, b""
            op, n = h[0] & 0x0F, h[1] & 0x7F
            if n == 126:
                n = struct.unpack(">H", f.read(2))[0]
            elif n == 127:
                n = struct.unpack(">Q", f.read(8))[0]
            return op, f.read(n)

        send_text(body)
        return s, recv

    def test_websocket_stream(self, server):
        import json
        s, recv = self._ws_connect(server, {"text": "Hello websocket.",
                                            "seed": 5})
        try:
            op, meta = recv()
            assert op == 1
            meta = json.loads(meta)
            assert meta["sample_rate"] == 22050
            assert meta["format"] == "pcm16"
            pcm = b""
            while True:
                op, data = recv()
                if op in (None, 8):  # close
                    break
                assert op == 2
                pcm += data
            wav = np.frombuffer(pcm, np.int16)
            assert len(wav) > 0 and len(wav) % 256 == 0
        finally:
            s.close()

    def test_websocket_error_is_framed_json(self, server):
        import json
        s, recv = self._ws_connect(server, {"text": "~~~"})
        try:
            op, payload = recv()
            assert op == 1
            assert "empty text" in json.loads(payload)["error"]
            op, _ = recv()
            assert op in (None, 8)
        finally:
            s.close()

    def test_http_429_on_overload(self, server, stream_engine):
        import queue as _q
        import urllib.error
        old = stream_engine._queue
        try:
            full = _q.Queue(maxsize=1)
            full.put_nowait(None)  # worker is blocked on `old`
            stream_engine._queue = full
            with pytest.raises(urllib.error.HTTPError) as ei:
                self._post(server + "/synthesize", {"text": "Busy."})
            assert ei.value.code == 429
        finally:
            stream_engine._queue = old


class TestTwoFlowStreaming:
    def test_two_flow_engine_streams(self, tmp_path_factory):
        """The flagship topology (n_flows=2) streams over HTTP-style
        generator: gated prelude offline, forward flow chunked."""
        import jax
        import pickle
        from flowtron_tpu.models import flowtron_init
        from flowtron_tpu.train.checkpoints import save_checkpoint
        from flowtron_tpu.train.radam import radam
        from flowtron_tpu.vocoder import waveglow_init
        from flowtron_tpu.serve import SynthesisEngine

        root = tmp_path_factory.mktemp("twoflow_stream")
        rng = np.random.default_rng(0)
        wavfile.write(root / "u.wav", 22050,
                      (rng.standard_normal(4096) * 2000).astype(np.int16))
        (root / "fl.txt").write_text(f"{root}/u.wav|hello|0\n")
        small = dict(n_speakers=1, n_speaker_dim=4, n_text=185,
                     n_text_dim=16, n_mel_channels=8, n_hidden=12,
                     n_attn_channels=8, n_lstm_layers=2,
                     mel_encoder_n_hidden=8)
        params, _ = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                  use_gate_layer=True, **small)
        ckpt = str(root / "model")
        save_checkpoint(ckpt, params, radam(1e-3).init(params), 0, 1e-3)
        wgp, wgc = waveglow_init(jax.random.PRNGKey(1), n_mel_channels=8,
                                 n_flows=4, n_group=8, n_early_every=2,
                                 n_early_size=2, n_layers=3, n_channels=16)
        with open(root / "wg.pkl", "wb") as f:
            pickle.dump({"params": wgp, "config": wgc}, f)

        from flowtron_tpu.config import load_config
        config = load_config(overrides=[
            f"data_config.training_files={root}/fl.txt",
            f"data_config.validation_files={root}/fl.txt",
            "data_config.p_arpabet=0.0",
            "data_config.cmudict_path=",
            "data_config.heteronyms_path=",
            "data_config.use_attn_prior=False",
        ])
        config["model_config"] = dict(small, n_flows=2,
                                      use_gate_layer=True)
        eng = SynthesisEngine(config, ckpt,
                              waveglow_path=str(root / "wg.pkl"),
                              max_batch=2, batch_timeout_ms=20,
                              text_buckets=(16,), n_frames=48)
        assert eng.can_stream  # 2-flow + vocoder now streams
        chunks = list(eng.stream("Hello there.", 0, seed=9))
        wav = np.concatenate(chunks)
        assert wav.dtype == np.int16
        assert len(wav) >= 256 and len(wav) % 256 == 0
        assert np.isfinite(wav.astype(np.float64)).all()


class TestMultiModel:
    """Multi-model serving: several engines behind one handler, routed
    by the request's "model" field (serve.py make_handler)."""

    @pytest.fixture(scope="class")
    def multi_server(self, engine, tmp_path_factory):
        import jax
        from http.server import ThreadingHTTPServer
        from flowtron_tpu.models import flowtron_init
        from flowtron_tpu.train.checkpoints import save_checkpoint
        from flowtron_tpu.train.radam import radam
        from flowtron_tpu.serve import SynthesisEngine, make_handler
        from flowtron_tpu.config import load_config

        root = tmp_path_factory.mktemp("serve_alt")
        rng = np.random.default_rng(1)
        wavfile.write(root / "u.wav", 22050,
                      (rng.standard_normal(4096) * 2000).astype(np.int16))
        (root / "fl.txt").write_text(f"{root}/u.wav|hello|0\n")
        small = dict(n_speakers=1, n_speaker_dim=4, n_text=185,
                     n_text_dim=16, n_mel_channels=8, n_hidden=12,
                     n_attn_channels=8, n_lstm_layers=2,
                     mel_encoder_n_hidden=8)
        params, _ = flowtron_init(jax.random.PRNGKey(7), n_flows=2,
                                  use_gate_layer=True, **small)
        ckpt = str(root / "model")
        save_checkpoint(ckpt, params, radam(1e-3).init(params), 0, 1e-3)
        config = load_config(overrides=[
            f"data_config.training_files={root}/fl.txt",
            f"data_config.validation_files={root}/fl.txt",
            "data_config.p_arpabet=0.0",
            "data_config.cmudict_path=",
            "data_config.heteronyms_path=",
            "data_config.use_attn_prior=False",
        ])
        config["model_config"] = dict(small, n_flows=2,
                                      use_gate_layer=True)
        # distinguishable from the default fixture: 3 frames vs 6
        alt = SynthesisEngine(config, ckpt, max_batch=4,
                              batch_timeout_ms=50, text_buckets=(16, 32),
                              n_frames=3)
        srv = ThreadingHTTPServer(
            ("127.0.0.1", 0),
            make_handler({"default": engine, "alt": alt}))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    def _post(self, url, body, timeout=300):
        import json
        import urllib.request
        req = urllib.request.Request(
            url, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=timeout)

    def test_models_endpoint(self, multi_server):
        import json
        import urllib.request
        with urllib.request.urlopen(multi_server + "/models",
                                    timeout=60) as r:
            m = json.loads(r.read())
        assert m["default"] == "default"
        assert sorted(x["name"] for x in m["models"]) == ["alt", "default"]
        assert all(x["sampling_rate"] == 22050 for x in m["models"])
        assert all(x["speaker_ids"] == [0] for x in m["models"])

    def test_routing_by_model_field(self, multi_server):
        """Same text + seed through the two engines (independent weight
        inits) must produce different audio -> proof the "model" field
        actually switched engines."""
        with self._post(multi_server + "/synthesize",
                        {"text": "Hello routing."}) as r:
            default_wav = r.read()
        with self._post(multi_server + "/synthesize",
                        {"text": "Hello routing.",
                         "model": "alt"}) as r:
            alt_wav = r.read()
        assert default_wav[:4] == alt_wav[:4] == b"RIFF"
        assert default_wav != alt_wav

    def test_unknown_model_is_404(self, multi_server):
        import json
        import urllib.error
        for path in ("/synthesize", "/stream"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                self._post(multi_server + path,
                           {"text": "Hi.", "model": "nope"})
            assert ei.value.code == 404
            assert "unknown model" in json.loads(ei.value.read())["error"]

    def test_healthz_aggregates(self, multi_server):
        import json
        import urllib.request
        with urllib.request.urlopen(multi_server + "/healthz",
                                    timeout=60) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok"
        assert set(h["models"]) == {"default", "alt"}

    def test_metrics_keyed_by_model(self, multi_server):
        import json
        import urllib.request
        self._post(multi_server + "/synthesize",
                   {"text": "Count me.", "model": "alt"}).read()
        with urllib.request.urlopen(multi_server + "/metrics",
                                    timeout=60) as r:
            m = json.loads(r.read())
        assert set(m) == {"default", "alt"}
        assert m["alt"]["requests"] >= 1


class TestVocodeBuckets:
    """Gate/length-aware two-stage vocoding (vocode_buckets): the
    completion thread fetches n_valid and vocodes at the smallest frame
    bucket covering the batch instead of always n_frames."""

    def _engine(self, stream_engine, **kw):
        from flowtron_tpu.serve import SynthesisEngine
        return SynthesisEngine(stream_engine.config,
                               stream_engine._ckpt_path,
                               waveglow_path=stream_engine._waveglow_path,
                               max_batch=2, batch_timeout_ms=20,
                               text_buckets=(16, 32), n_frames=48, **kw)

    def test_staged_matches_fused_audio(self, stream_engine):
        # force the staged path at the full-length bucket (the auto
        # rule would pick fused): it runs exactly the fused epilogue
        # ops with the same per-request latents (program split may
        # reassociate floats, so compare to 1 int16 LSB, not bitwise)
        staged = self._engine(stream_engine, vocode_buckets=(24,))
        assert staged._synth_mel is not None
        assert staged._vocode_buckets == (24, 48)
        staged._synth_vocode = None   # force staged for every batch
        staged._vocode_buckets = (48,)  # pin the full-length bucket
        try:
            got, _ = staged.submit("Hello staged.", 0, seed=21)
            want, _ = stream_engine.submit("Hello staged.", 0, seed=21)
            assert len(got) == len(want)
            assert np.abs(got.astype(np.int32)
                          - want.astype(np.int32)).max() <= 1
        finally:
            staged.shutdown()

    def test_short_requests_use_small_bucket(self, stream_engine):
        eng = self._engine(stream_engine, vocode_buckets=(8,))
        assert eng._vocode_buckets == (8, 48)
        try:
            wav, _ = eng.submit("Hi.", 0, seed=5, n_frames=4)
            assert 256 <= len(wav) <= 4 * 256
            assert eng._vocode_norm._cache_size() == 1  # the (B,8) program
            wav2, _ = eng.submit("Hello much longer text here.", 0,
                                 seed=6)
            assert len(wav2) % 256 == 0
            # no n_frames cap -> the auto rule keeps the batch on the
            # fused one-dispatch chain (no staged program compiled)
            assert eng._vocode_norm._cache_size() == 1
            assert eng._synth_vocode._cache_size() == 1
            m = eng.metrics()
            assert m["staged_batches"] == 1
            assert m["vocode_bucket_hits"]["8"] == 1
        finally:
            eng.shutdown()

    def test_warmup_covers_both_stages(self, stream_engine):
        eng = self._engine(stream_engine, vocode_buckets=(8,))
        try:
            out = eng.warmup()
            # 2 batch buckets x 2 text buckets synth-mel programs
            # + 2 batch buckets x 1 reachable (sub-n_frames) vocode
            # + 2 batch buckets x 2 text buckets fused-fallback programs
            assert out["programs"] == 10
            assert eng._synth_mel._cache_size() >= 4
            assert eng._vocode_norm._cache_size() >= 2
            assert eng._synth_vocode._cache_size() >= 4
        finally:
            eng.shutdown()

    def test_no_sub_bucket_disables_staged(self, stream_engine):
        # vocode_buckets with nothing below n_frames would build a dead
        # staged program set; it must be disabled with a warning
        eng = self._engine(stream_engine, vocode_buckets=(48, 60))
        try:
            assert eng._synth_mel is None
            assert eng._vocode_buckets is None
            wav, _ = eng.submit("Still serves fused.", 0, seed=3)
            assert len(wav) > 0
        finally:
            eng.shutdown()

    def test_audio_independent_of_batch_composition(self, stream_engine):
        # per-request vocoder latents: the same request returns the
        # same audio whether it runs alone or co-batched (the old
        # PRNGKey(0)-at-batch-shape draw broke this)
        solo, _ = stream_engine.submit("Determinism check.", 0, seed=77)
        got = {}

        def req(text, seed, key):
            got[key] = stream_engine.submit(text, 0, seed=seed)[0]

        ts = [threading.Thread(target=req,
                               args=("Determinism check.", 77, "a")),
              threading.Thread(target=req,
                               args=("A different neighbor.", 5, "b"))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(got["a"]) == len(solo)
        assert np.abs(got["a"].astype(np.int32)
                      - solo.astype(np.int32)).max() <= 1

    def test_staged_composes_with_replicas(self, stream_engine):
        # staged handles carry the replica's committed params/wgp, so
        # the bucketed vocode runs on the same device as its synth
        from flowtron_tpu.serve import SynthesisEngine
        eng = SynthesisEngine(stream_engine.config,
                              stream_engine._ckpt_path,
                              waveglow_path=stream_engine._waveglow_path,
                              max_batch=2, batch_timeout_ms=20,
                              text_buckets=(16, 32), n_frames=48,
                              replicas=2, vocode_buckets=(8,))
        try:
            wavs = [eng.submit("Replica bucket check.", 0, seed=s,
                               n_frames=6)[0] for s in (1, 2, 3)]
            assert all(256 <= len(w) <= 6 * 256 for w in wavs)
            assert sum(eng.metrics()["replica_batches"]) >= 3
            assert all(c > 0 for c in eng.metrics()["replica_batches"])
        finally:
            eng.shutdown()


class TestLifecycle:
    """Engine shutdown: clean worker exit, refused new work, freed
    device references (the runtime model-unload building block)."""

    def test_shutdown_refuses_new_work_and_frees_memory(self, engine):
        from flowtron_tpu.serve import SynthesisEngine
        eng = SynthesisEngine(engine.config, engine._ckpt_path,
                              max_batch=4, batch_timeout_ms=20,
                              text_buckets=(16, 32), n_frames=6)
        wav, _ = eng.submit("Hello.", 0)
        assert len(wav) > 0
        eng.shutdown()
        assert eng.params is None and eng._synth is None
        assert not eng._worker.is_alive()
        assert not eng._completer.is_alive()
        with pytest.raises(RuntimeError, match="shut down"):
            eng.submit("More.", 0)
        eng.shutdown()  # idempotent

    def test_shutdown_reclaims_streamers(self, stream_engine):
        from flowtron_tpu.serve import SynthesisEngine
        eng = SynthesisEngine(stream_engine.config,
                              stream_engine._ckpt_path,
                              waveglow_path=stream_engine._waveglow_path,
                              max_batch=2, batch_timeout_ms=20,
                              text_buckets=(16, 32), n_frames=48,
                              stream_workers=1)
        assert len(np.concatenate(list(eng.stream("Hello.", 0,
                                                  seed=5)))) > 0
        eng.shutdown()
        assert eng._stream_pool is None and eng.wg is None
        with pytest.raises(RuntimeError, match="shut down"):
            eng.stream("More.", 0)

    def test_warmup_precompiles_all_bucket_programs(self, engine):
        from flowtron_tpu.serve import SynthesisEngine
        eng = SynthesisEngine(engine.config, engine._ckpt_path,
                              max_batch=4, batch_timeout_ms=20,
                              text_buckets=(16, 32), n_frames=6)
        out = eng.warmup()
        assert out["programs"] == 3 * 2  # B in {1,2,4} x Tk in {16,32}
        # every (B, Tk) pair traced: no compile left for first requests
        assert eng._synth._cache_size() >= 6
        wav, _ = eng.submit("Hello warm.", 0)
        assert len(wav) > 0
        eng.shutdown()


class TestRuntimeModels:
    """Runtime model management: POST /models loads a voice without a
    restart; DELETE /models/<name> shuts it down and frees its memory."""

    @pytest.fixture(scope="class")
    def rt(self, engine, tmp_path_factory):
        import json as _json
        from http.server import ThreadingHTTPServer
        from flowtron_tpu.serve import SynthesisEngine, make_handler
        from flowtron_tpu.config import load_config

        root = tmp_path_factory.mktemp("rt_models")
        cfg_path = str(root / "config.json")
        with open(cfg_path, "w") as f:
            _json.dump(engine.config, f)

        def loader(config_path, ckpt, vocoder):
            return SynthesisEngine(load_config(config_path), ckpt,
                                   vocoder, max_batch=2,
                                   batch_timeout_ms=20,
                                   text_buckets=(16, 32), n_frames=4)

        base = loader(cfg_path, engine._ckpt_path, "")
        srv = ThreadingHTTPServer(
            ("127.0.0.1", 0),
            make_handler({"default": base}, loader=loader))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield (f"http://127.0.0.1:{srv.server_address[1]}", cfg_path,
               engine._ckpt_path)
        srv.shutdown()

    def _req(self, url, body=None, method="POST", timeout=300):
        import json
        import urllib.request
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            url, data=data, method=method,
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=timeout)

    def test_load_and_route(self, rt):
        import json
        import urllib.request
        url, cfg_path, ckpt = rt
        with self._req(url + "/models", {"name": "extra",
                                         "config": cfg_path,
                                         "checkpoint": ckpt}) as r:
            assert json.loads(r.read())["loaded"] == "extra"
        with urllib.request.urlopen(url + "/models", timeout=60) as r:
            names = [m["name"] for m in json.loads(r.read())["models"]]
        assert set(names) == {"default", "extra"}
        with self._req(url + "/synthesize",
                       {"text": "Hello new voice.",
                        "model": "extra"}) as r:
            assert r.read()[:4] == b"RIFF"

    def test_duplicate_load_is_409(self, rt):
        import urllib.error
        url, cfg_path, ckpt = rt
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._req(url + "/models", {"name": "extra",
                                        "config": cfg_path,
                                        "checkpoint": ckpt})
        assert ei.value.code == 409

    def test_missing_field_is_400(self, rt):
        import urllib.error
        url, _, _ = rt
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._req(url + "/models", {"name": "x"})
        assert ei.value.code == 400

    def test_unload_default_promotes_next(self, rt):
        import json
        import urllib.request
        url, _, _ = rt
        with self._req(url + "/models/default", method="DELETE") as r:
            out = json.loads(r.read())
        assert out == {"unloaded": "default", "default": "extra"}
        with urllib.request.urlopen(url + "/models", timeout=60) as r:
            models = json.loads(r.read())
        assert models["default"] == "extra"
        # requests without a model field now route to the promoted one
        with self._req(url + "/synthesize", {"text": "Still here."}) as r:
            assert r.read()[:4] == b"RIFF"

    def test_unload_last_model_is_409(self, rt):
        import urllib.error
        url, _, _ = rt
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._req(url + "/models/extra", method="DELETE")
        assert ei.value.code == 409

    def test_unload_unknown_is_404(self, rt):
        import urllib.error
        url, _, _ = rt
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._req(url + "/models/nope", method="DELETE")
        assert ei.value.code == 404

    def test_load_without_loader_is_501(self, engine):
        import urllib.error
        from http.server import ThreadingHTTPServer
        from flowtron_tpu.serve import make_handler
        srv = ThreadingHTTPServer(("127.0.0.1", 0),
                                  make_handler(engine))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            with pytest.raises(urllib.error.HTTPError) as ei:
                self._req(url + "/models", {"name": "x", "config": "c",
                                            "checkpoint": "k"})
            assert ei.value.code == 501
        finally:
            srv.shutdown()


class TestDenoise:
    @pytest.fixture(scope="class")
    def denoise_engine(self, stream_engine):
        from flowtron_tpu.serve import SynthesisEngine
        eng = SynthesisEngine(stream_engine.config,
                              stream_engine._ckpt_path,
                              waveglow_path=stream_engine._waveglow_path,
                              max_batch=2, batch_timeout_ms=20,
                              text_buckets=(16, 32), n_frames=48,
                              denoise=0.05)
        yield eng
        eng.shutdown()

    def test_denoised_engine_differs_and_stays_valid(self, stream_engine,
                                                     denoise_engine):
        eng = denoise_engine
        wav, sr = eng.submit("Denoise me please.", 0, seed=13)
        ref, _ = stream_engine.submit("Denoise me please.", 0, seed=13)
        assert sr == 22050
        assert len(wav) == len(ref) and len(wav) % 256 == 0
        assert np.isfinite(wav.astype(np.float64)).all()
        assert not np.array_equal(wav, ref)  # subtraction applied
        # per-request strength override: a different strength
        # changes the audio; identical strength reproduces it
        w2, _ = eng.submit("Denoise me please.", 0, seed=13,
                           denoise=0.5)
        w3, _ = eng.submit("Denoise me please.", 0, seed=13,
                           denoise=0.05)
        assert not np.array_equal(w2, wav)
        assert np.array_equal(w3, wav)

    def test_per_request_denoise_needs_engine_flag(self, stream_engine):
        with pytest.raises(ValueError, match="requires an engine"):
            stream_engine.submit("Hi.", 0, denoise=0.1)

    def test_stream_denoise_applies_and_overrides(self, denoise_engine):
        """-d engines denoise the stream path too (StreamingDenoiser);
        per-request strength overrides like the batch path."""
        eng = denoise_engine

        def run(**kw):
            return np.concatenate(
                list(eng.stream("Stream denoise.", 0, seed=21, **kw)))

        base = run(denoise=0.0)      # per-request off
        dn = run()                   # engine default strength 0.05
        dn2 = run(denoise=0.05)      # explicit == default
        dn3 = run(denoise=0.5)
        # denoise changes the audio but never its length
        assert len(base) == len(dn) == len(dn3) and len(base) > 0
        assert not np.array_equal(base, dn)
        assert np.array_equal(dn, dn2)
        assert not np.array_equal(dn3, dn)

    def test_stream_per_request_denoise_needs_engine_flag(
            self, stream_engine):
        # raised eagerly, before the generator / 200 header
        with pytest.raises(ValueError, match="requires an engine"):
            stream_engine.stream("Hi.", denoise=0.1)

    def test_denoise_composes_with_staged_vocoding(self, stream_engine):
        """-d inside vocode_norm runs at sub-n_frames vocode buckets
        too (the staged two-stage path), deterministically."""
        from flowtron_tpu.serve import SynthesisEngine
        eng = SynthesisEngine(stream_engine.config,
                              stream_engine._ckpt_path,
                              waveglow_path=stream_engine._waveglow_path,
                              max_batch=2, batch_timeout_ms=20,
                              text_buckets=(16, 32), n_frames=48,
                              vocode_buckets=(16,), denoise=0.05)
        try:
            # n_frames cap fits the 16-frame bucket -> staged dispatch
            a, _ = eng.submit("Short one.", 0, seed=3, n_frames=12)
            b, _ = eng.submit("Short one.", 0, seed=3, n_frames=12)
            assert eng.metrics()["staged_batches"] >= 1
            assert len(a) == 12 * 256
            np.testing.assert_array_equal(a, b)
            # and a different strength changes the staged audio too
            c, _ = eng.submit("Short one.", 0, seed=3, n_frames=12,
                              denoise=0.5)
            assert not np.array_equal(a, c)
        finally:
            eng.shutdown()


class TestProfileEndpoint:
    def test_profile_capture_writes_trace(self, engine, tmp_path):
        import json
        import os
        import urllib.request
        from http.server import ThreadingHTTPServer
        from flowtron_tpu.serve import make_handler
        srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            body = json.dumps({"seconds": 0.2,
                               "dir": str(tmp_path)}).encode()
            req = urllib.request.Request(
                url + "/profile", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                out = json.loads(r.read())
            assert out["trace_dir"] == str(tmp_path)
            files = [os.path.join(dp, f)
                     for dp, _, fs in os.walk(tmp_path) for f in fs]
            assert files, "no trace files written"
        finally:
            srv.shutdown()


class TestClientScript:
    def test_client_synthesize_and_stream(self, stream_engine, tmp_path):
        import subprocess
        import sys
        from http.server import ThreadingHTTPServer
        from flowtron_tpu.serve import make_handler
        srv = ThreadingHTTPServer(("127.0.0.1", 0),
                                  make_handler(stream_engine))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            client = os.path.join(os.path.dirname(__file__), "..",
                                  "scripts", "tts_client.py")
            for extra, name in (([], "plain.wav"),
                                (["--stream"], "stream.wav")):
                out = tmp_path / name
                r = subprocess.run(
                    [sys.executable, client,
                     "Hello client.", "--url", url, "-o", str(out),
                     "--seed", "9"] + extra,
                    capture_output=True, text=True, timeout=300)
                assert r.returncode == 0, r.stderr
                data = out.read_bytes()
                assert data[:4] == b"RIFF" and len(data) > 300
            # error path: empty text -> nonzero exit, message on stderr
            r = subprocess.run(
                [sys.executable, client, "~~~",
                 "--url", url, "-o", str(tmp_path / "x.wav")],
                capture_output=True, text=True, timeout=120)
            assert r.returncode == 1 and "HTTP 400" in r.stderr
        finally:
            srv.shutdown()


@pytest.fixture(scope="module")
def mux_engine(stream_engine):
    """An engine whose /stream path runs through the batched N-slot
    multiplexer (--stream-mux) instead of the per-stream worker pool,
    rebuilt from the stream_engine fixture's on-disk artifacts."""
    from flowtron_tpu.serve import SynthesisEngine
    eng = SynthesisEngine(stream_engine.config,
                          stream_engine._ckpt_path,
                          waveglow_path=stream_engine._waveglow_path,
                          max_batch=2, batch_timeout_ms=20,
                          text_buckets=(16, 32), n_frames=48,
                          stream_mux=3)
    yield eng
    eng.shutdown()


class TestMuxServing:
    def test_mux_stream_matches_pool_stream(self, mux_engine,
                                            stream_engine):
        """Same text/seed: the muxed stream yields the same utterance
        as the pooled per-stream path (identical key derivation and
        chunk geometry; batching changes scheduling, not audio)."""
        text, seed = "Hello there mux.", 11
        a = np.concatenate(list(mux_engine.stream(text, 0, seed=seed)))
        b = np.concatenate(list(stream_engine.stream(text, 0,
                                                     seed=seed)))
        assert a.dtype == np.int16 and a.size > 0
        assert a.shape == b.shape
        # int16 quantization of float audio that differs only by
        # batched-matmul rounding: at most 1 LSB apart
        assert np.abs(a.astype(np.int32)
                      - b.astype(np.int32)).max() <= 1

    def test_mux_concurrent_streams_all_complete(self, mux_engine):
        """Three concurrent streams through the shared mux all finish
        and each equals its own serial run (per-slot isolation under
        concurrency)."""
        texts = ["First mux stream.", "Second one here.",
                 "And a third."]
        results = [None] * 3
        errs = []

        def run(i):
            try:
                results[i] = np.concatenate(list(
                    mux_engine.stream(texts[i], 0, seed=30 + i)))
            except Exception as e:  # surfaced below
                errs.append(e)

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errs, errs
        for i in range(3):
            serial = np.concatenate(list(
                mux_engine.stream(texts[i], 0, seed=30 + i)))
            assert results[i].shape == serial.shape
            assert np.abs(results[i].astype(np.int32)
                          - serial.astype(np.int32)).max() <= 1

    def test_mux_overload_raises_429(self, stream_engine):
        """stream_mux=1 with a never-firing gate: a second stream while
        the slot is mid-utterance fails fast with EngineOverloaded."""
        import jax
        import jax.numpy as jnp
        from flowtron_tpu.serve import SynthesisEngine, EngineOverloaded
        from flowtron_tpu.models import flowtron_init
        from flowtron_tpu.train.checkpoints import save_checkpoint
        import tempfile
        import os
        from flowtron_tpu.train.radam import radam

        with tempfile.TemporaryDirectory() as root:
            params, _ = flowtron_init(
                jax.random.PRNGKey(0),
                **stream_engine.config["model_config"])
            params["flows"][0]["gate_layer"]["b"] = jnp.asarray([-50.0])
            ckpt = os.path.join(root, "model")
            save_checkpoint(ckpt, params, radam(1e-3).init(params), 0,
                            1e-3)
            eng = SynthesisEngine(stream_engine.config, ckpt,
                                  waveglow_path=(
                                      stream_engine._waveglow_path),
                                  max_batch=2, batch_timeout_ms=20,
                                  text_buckets=(16, 32), n_frames=400,
                                  stream_mux=1)
            try:
                gen_a = eng.stream("Occupy the only slot.", 0, seed=40)
                with pytest.raises(EngineOverloaded):
                    eng.stream("No slot for me.", 0, seed=41)
                gen_a.close()
            finally:
                eng.shutdown()

    def test_mux_abandoned_stream_frees_slot(self, mux_engine):
        """Dropping a muxed stream generator mid-way closes its slot;
        later streams still run."""
        gen = mux_engine.stream("Abandon me quickly now.", 0, seed=50)
        next(gen)
        gen.close()
        out = np.concatenate(list(
            mux_engine.stream("Still alive after that.", 0, seed=51)))
        assert out.size > 0

    def test_mux_split_streams_paragraph(self, mux_engine):
        """split=True: paragraph-length text streams as one continuous
        PCM stream through sequential mux slots."""
        text = ("This is sentence one and it has words. "
                "Sentence two follows right after it. "
                "A third sentence closes the paragraph.")
        out = np.concatenate(list(
            mux_engine.stream(text, 0, seed=60, split=True)))
        assert out.size > 0
        # same text without the mux (pool engine): equal audio
        # per-segment keys -> the outputs should match closely
        # (scheduling-only difference)

    def test_mux_per_request_controls(self, mux_engine):
        """n_frames caps output; temperature reaches the slot."""
        short = np.concatenate(list(mux_engine.stream(
            "Capped stream here.", 0, seed=70, n_frames=8)))
        full = np.concatenate(list(mux_engine.stream(
            "Capped stream here.", 0, seed=70)))
        assert short.size <= 8 * 256
        assert full.size >= short.size

    def test_mux_engine_warmup_then_stream(self, mux_engine):
        """warmup() runs a throwaway stream through the mux (compiling
        tick/join/window programs) and leaves the engine serving."""
        out = mux_engine.warmup()
        assert out["programs"] >= 1
        assert mux_engine.active_mux_streams == 0
        pcm = np.concatenate(list(
            mux_engine.stream("After warmup.", 0, seed=90)))
        assert pcm.size > 0

    def test_mux_http_stream_transport(self, mux_engine):
        """Chunked-transfer /stream over a real HTTP server backed by
        the mux; two concurrent clients."""
        import json
        import urllib.request
        from http.server import ThreadingHTTPServer
        from flowtron_tpu.serve import make_handler
        srv = ThreadingHTTPServer(("127.0.0.1", 0),
                                  make_handler(mux_engine))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}/stream"
            results = {}

            def fetch(i):
                req = urllib.request.Request(
                    url, data=json.dumps(
                        {"text": f"Client {i} speaking.",
                         "seed": 80 + i}).encode(),
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=300) as r:
                    assert r.headers.get(
                        "Transfer-Encoding") == "chunked"
                    results[i] = r.read()

            ts = [threading.Thread(target=fetch, args=(i,))
                  for i in range(2)]
            for x in ts:
                x.start()
            for x in ts:
                x.join(timeout=300)
            for i in range(2):
                assert results[i][:4] == b"RIFF"
                assert len(results[i]) > 1000
        finally:
            srv.shutdown()


class TestStreamLoadHarness:
    def test_run_stream_load_reports_and_retries(self, mux_engine):
        """scripts/bench_serve.run_stream_load drives engine.stream()
        under more concurrency than the mux has slots: overloads retry
        (not fail), every stream completes, TTFA/throughput fields come
        back sane."""
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "bench_serve",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "bench_serve.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        r = mod.run_stream_load(
            mux_engine, 5, 3,
            texts=["load one.", "load two.", "load three."])
        assert r["n_requests"] == 5 and r["concurrency"] == 3
        assert r["streams_per_s"] > 0
        assert 0 < r["ttfa_p50_ms"] <= r["ttfa_p99_ms"]
        assert r["audio_s"] > 0

    def test_mux_stream_denoise_applies_and_overrides(self,
                                                      stream_engine):
        """-d denoise on a --stream-mux engine: the StreamingDenoiser
        runs per muxed stream, per-request override works, and the
        audio length never changes."""
        from flowtron_tpu.serve import SynthesisEngine
        eng = SynthesisEngine(stream_engine.config,
                              stream_engine._ckpt_path,
                              waveglow_path=stream_engine._waveglow_path,
                              max_batch=2, batch_timeout_ms=20,
                              text_buckets=(16, 32), n_frames=48,
                              stream_mux=2, denoise=0.05)
        try:
            def run(**kw):
                return np.concatenate(list(
                    eng.stream("Mux denoise.", 0, seed=33, **kw)))
            base = run(denoise=0.0)
            dn = run()                 # engine default 0.05
            dn2 = run(denoise=0.5)
            assert base.size == dn.size == dn2.size
            assert not np.array_equal(base, dn)
            assert not np.array_equal(dn, dn2)
        finally:
            eng.shutdown()
