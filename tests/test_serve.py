"""Serving engine tests: request batching, padding buckets, error paths.

Exercises SynthesisEngine directly (no HTTP) on a tiny model + corpus.
"""

import threading

import numpy as np
import pytest
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
        with pytest.raises(RuntimeError, match="empty text"):
            engine.submit("~~~", 0)   # cleans to symbols dropped -> empty

    def test_long_text_truncated_to_bucket(self, engine):
        wav, _ = engine.submit("word " * 50, 0)  # exceeds largest bucket
        assert len(wav) > 0
