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


class TestQualityMetrics:
    """The reference's health check is visual ("train until attention
    looks diagonal", reference:README.md:37-40); these pin the numeric
    versions on constructed alignments with known scores."""

    def _perfect(self, O=40, I=20):
        attn = np.zeros((1, O, I), np.float32)
        attn[0, np.arange(O), (np.arange(O) * (I - 1) // (O - 1))] = 1.0
        return attn

    def test_diagonal_attention_scores_one(self):
        from flowtron_tpu.train.evaluate import (attention_diagonality,
                                                 attention_monotonicity)
        attn = self._perfect()
        assert attention_diagonality(attn, [40], [20]) > 0.99
        assert attention_monotonicity(attn, [40], [20]) > 0.99

    def test_uniform_attention_scores_low(self):
        from flowtron_tpu.train.evaluate import attention_diagonality
        attn = np.full((1, 40, 20), 1 / 20, np.float32)
        # uniform mass in a +-max(0.12, 2/I) band ~ 2*band of the total
        assert attention_diagonality(attn, [40], [20]) < 0.45

    def test_jumpy_attention_flunks_monotonicity(self):
        from flowtron_tpu.train.evaluate import attention_monotonicity
        attn = np.zeros((1, 40, 20), np.float32)
        attn[0, ::2, 0] = 1.0   # alternate between text pos 0 and 19
        attn[0, 1::2, 19] = 1.0
        assert attention_monotonicity(attn, [40], [20]) < 0.6

    def test_metrics_respect_lengths(self):
        from flowtron_tpu.train.evaluate import attention_diagonality
        attn = self._perfect(40, 20)
        # garbage in the padding region must not affect the score
        padded = np.zeros((1, 64, 32), np.float32)
        padded[:, :40, :20] = attn
        padded[:, 40:, :] = 1.0 / 32
        padded[:, :40, 20:] = 0.0
        a = attention_diagonality(attn, [40], [20])
        b = attention_diagonality(padded, [40], [20])
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_gate_accuracy(self):
        from flowtron_tpu.train.evaluate import gate_accuracy
        T, B = 10, 2
        target = np.zeros((B, T), np.float32)
        target[:, 7:] = 1.0  # gate from frame 7
        logits = np.full((T, B, 1), -5.0, np.float32)
        logits[7:, :, 0] = 5.0           # sample 0: perfect
        logits[5:, 1, 0] = 5.0           # sample 1: fires 2 frames early
        out_lens = [10, 8]               # only t < out_len counts
        # sample 0: 10/10; sample 1: frames 0-7, wrong at 5,6 -> 6/8
        assert gate_accuracy(logits, target, out_lens) == (10 + 6) / 18

    def test_isotonic_fit(self):
        from flowtron_tpu.train.evaluate import _isotonic_increasing
        y = np.array([1.0, 3.0, 2.0, 2.0, 5.0])
        iso = _isotonic_increasing(y)
        assert (np.diff(iso) >= -1e-12).all()
        np.testing.assert_allclose(iso, [1, 7 / 3, 7 / 3, 7 / 3, 5])


class TestEvaluate:
    def test_reports_losses_and_invertibility(self, eval_setup):
        from flowtron_tpu.train.evaluate import evaluate
        config, ckpt = eval_setup
        out = evaluate(config, ckpt, invertibility_frames=12)
        for k in ("loss", "nll", "gate", "ctc", "invertibility_err"):
            assert k in out and np.isfinite(out[k]), (k, out)
        # quality proxies present and in range on any checkpoint
        for k in ("attn_diagonality", "attn_monotonicity",
                  "gate_accuracy"):
            assert k in out and 0.0 <= out[k] <= 1.0, (k, out)
        # an untrained (zero-init couplings = identity flows) model is
        # exactly invertible up to float rounding
        assert out["invertibility_err"] < 1e-4, out

    def test_plots_written(self, eval_setup, tmp_path):
        from flowtron_tpu.train.evaluate import evaluate
        config, ckpt = eval_setup
        evaluate(config, ckpt, invertibility_frames=0,
                 plots_dir=str(tmp_path / "plots"))
        for name in ("attention.png", "gate.png"):
            p = tmp_path / "plots" / name
            assert p.exists() and p.stat().st_size > 500, name

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


class TestExportScript:
    def test_export_round_trips_through_torch_format(self, eval_setup,
                                                     tmp_path):
        """scripts/export_torch.py writes a reference-format .pt that
        our own importer reads back bit-exactly — the user journey of
        moving a model trained here into the PyTorch reference
        (reference:inference.py:51-56)."""
        import json
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "export_torch",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "export_torch.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        config, ckpt = eval_setup
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps(config))
        out = tmp_path / "exported.pt"
        assert mod.main(["-c", str(cfg_path), "-f", ckpt,
                         "-o", str(out)]) == 0

        import torch
        blob = torch.load(str(out), weights_only=True)
        assert "state_dict" in blob and len(blob["state_dict"]) > 10

        from flowtron_tpu.infer.sampling import load_model_for_inference
        import jax
        ref_params, _ = load_model_for_inference(config, ckpt)
        imp_params, _ = load_model_for_inference(config, str(out))
        ref_leaves = jax.tree_util.tree_leaves(ref_params)
        imp_leaves = jax.tree_util.tree_leaves(imp_params)
        assert len(ref_leaves) == len(imp_leaves)
        for a, b in zip(ref_leaves, imp_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
