"""Standalone checkpoint evaluation (flowtron-evaluate).

The reference can only report validation loss from inside train()
(reference:train.py:142-202); evaluate() runs the same decomposition
plus the (fixed) invertibility oracle on any saved checkpoint.
"""

import numpy as np
import pytest
import jax
from scipy.io import wavfile

# n_mel_channels=80: the data pipeline's mel frontend is fixed at 80
# (same as the reference's TacotronSTFT); everything else is tiny
SMALL = dict(n_speakers=1, n_speaker_dim=4, n_text=185, n_text_dim=16,
             n_mel_channels=80, n_hidden=12, n_attn_channels=8,
             n_lstm_layers=2, mel_encoder_n_hidden=8)


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    from flowtron_tpu.models import flowtron_init
    from flowtron_tpu.train.checkpoints import save_checkpoint
    from flowtron_tpu.train.radam import radam
    from flowtron_tpu.config import load_config

    root = tmp_path_factory.mktemp("evaluate")
    rng = np.random.default_rng(0)
    for i in range(2):
        wav = (rng.standard_normal(4096) * 2000).astype(np.int16)
        wavfile.write(root / f"u{i}.wav", 22050, wav)
    (root / "fl.txt").write_text(
        f"{root}/u0.wav|hello there|0\n{root}/u1.wav|general kenobi|0\n")

    params, _ = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                              use_gate_layer=True, **SMALL)
    ckpt = str(root / "model")
    save_checkpoint(ckpt, params, radam(1e-3).init(params), 0, 1e-3)

    config = load_config(overrides=[
        f"data_config.training_files={root}/fl.txt",
        f"data_config.validation_files={root}/fl.txt",
        "data_config.p_arpabet=0.0",
        "data_config.cmudict_path=",
        "data_config.heteronyms_path=",
        "data_config.use_attn_prior=False",
        "train_config.batch_size=2",
    ])
    config["model_config"] = dict(SMALL, n_flows=2, use_gate_layer=True)
    return config, ckpt


class TestEvaluate:
    def test_reports_losses_and_invertibility(self, eval_setup):
        from flowtron_tpu.train.evaluate import evaluate
        config, ckpt = eval_setup
        out = evaluate(config, ckpt, invertibility_frames=12)
        for k in ("loss", "nll", "gate", "ctc", "invertibility_err"):
            assert k in out and np.isfinite(out[k]), (k, out)
        # an untrained (zero-init couplings = identity flows) model is
        # exactly invertible up to float rounding
        assert out["invertibility_err"] < 1e-4, out

    def test_cli_prints_json(self, eval_setup, capsys):
        import json
        from flowtron_tpu.cli import evaluate_main
        config, ckpt = eval_setup
        import tempfile
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            json.dump(config, f)
        evaluate_main(["-c", f.name, "-f", ckpt,
                       "--invertibility-frames", "0"])
        line = capsys.readouterr().out.strip().splitlines()[-1]
        parsed = json.loads(line)
        assert "loss" in parsed and "invertibility_err" not in parsed
