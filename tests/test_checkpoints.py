"""Checkpoint tests: torch state_dict round-trip, resume semantics,
warmstart filters, trainable masks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flowtron_tpu.models import flowtron_init
from flowtron_tpu.train.checkpoints import (
    export_torch_state_dict, import_torch_state_dict,
    save_checkpoint, load_checkpoint, warmstart, trainable_mask, _flatten,
)
from flowtron_tpu.train.radam import radam

SMALL = dict(n_speakers=2, n_speaker_dim=4, n_text=185, n_text_dim=16,
             n_mel_channels=8, n_hidden=12, n_attn_channels=8,
             n_lstm_layers=2, mel_encoder_n_hidden=8)


@pytest.fixture(scope="module")
def model():
    return flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                         use_gate_layer=True, **SMALL)


class TestTorchBridge:
    def test_roundtrip(self, model):
        params, _ = model
        sd = export_torch_state_dict(params)
        # names match the reference module tree
        assert "flows.0.conv.weight" in sd
        assert "flows.1.ar_step.conv.weight" in sd
        assert "encoder.lstm.weight_ih_l0_reverse" in sd
        assert "flows.0.attention_layer.query.linear_layer.weight" in sd
        assert sd["flows.0.conv.weight"].shape == (16, 12, 1)

        params2, _ = flowtron_init(jax.random.PRNGKey(99), n_flows=2,
                                   use_gate_layer=True, **SMALL)
        params2, loaded = import_torch_state_dict(params2, sd)
        assert len(loaded) == len(sd)
        f1, f2 = _flatten(params), _flatten(params2)
        for k in f1:
            np.testing.assert_allclose(np.asarray(f1[k]),
                                       np.asarray(f2[k]), atol=0,
                                       err_msg=k)

    def test_include_filter(self, model):
        params, _ = model
        sd = export_torch_state_dict(params)
        params2, _ = flowtron_init(jax.random.PRNGKey(99), n_flows=2,
                                   use_gate_layer=True, **SMALL)
        orig_flow_w = np.asarray(
            params2["flows"][0]["lstm"]["layers"][0]["w_ih"]).copy()
        params2, loaded = import_torch_state_dict(
            params2, sd, include_layers=["speaker", "encoder", "embedding"])
        assert all(("speaker" in n) or ("encoder" in n) or ("embedding" in n)
                   for n in loaded)
        # flows untouched
        np.testing.assert_allclose(
            np.asarray(params2["flows"][0]["lstm"]["layers"][0]["w_ih"]),
            orig_flow_w)

    def test_speaker_mismatch_dropped(self, model):
        params, _ = model
        sd = export_torch_state_dict(params)
        sd["speaker_embedding.weight"] = np.zeros((10, 4), np.float32)
        params2, loaded = import_torch_state_dict(
            {k: v for k, v in params.items()}, sd)
        assert "speaker_embedding.weight" not in loaded


class TestNativeCheckpoint:
    def test_save_resume(self, model, tmp_path):
        params, _ = model
        opt = radam(1e-3)
        opt_state = opt.init(params)
        path = str(tmp_path / "ck")
        save_checkpoint(path, params, opt_state, 123, 1e-3)

        params2, _ = flowtron_init(jax.random.PRNGKey(7), n_flows=2,
                                   use_gate_layer=True, **SMALL)
        opt_state2 = opt.init(params2)
        params3, opt_state3, it, lr = load_checkpoint(path, params2,
                                                      opt_state2)
        assert it == 123 and lr == 1e-3
        f1, f3 = _flatten(params), _flatten(params3)
        for k in f1:
            np.testing.assert_allclose(np.asarray(f1[k]),
                                       np.asarray(f3[k]), err_msg=k)

    def test_ignore_layers_skips_optimizer(self, model, tmp_path):
        params, _ = model
        opt = radam(1e-3)
        opt_state = opt.init(params)
        # simulate some optimizer progress
        import optax
        g = jax.tree.map(jnp.ones_like, params)
        _, opt_state = opt.update(g, opt_state, params)
        path = str(tmp_path / "ck2")
        save_checkpoint(path, params, opt_state, 5, 1e-3)

        params2, _ = flowtron_init(jax.random.PRNGKey(8), n_flows=2,
                                   use_gate_layer=True, **SMALL)
        fresh_emb = np.asarray(params2["embedding"]["table"]).copy()
        opt_state2 = opt.init(params2)
        params3, opt_state3, _, _ = load_checkpoint(
            path, params2, opt_state2,
            ignore_layers=["embedding.table"])
        # ignored layer keeps the fresh value
        np.testing.assert_allclose(
            np.asarray(params3["embedding"]["table"]), fresh_emb)
        # optimizer was NOT restored (count still 0)
        assert int(opt_state3.count) == 0

    def test_warmstart_native(self, model, tmp_path):
        params, _ = model
        opt = radam(1e-3)
        path = str(tmp_path / "ck3")
        save_checkpoint(path, params, opt.init(params), 1, 1e-3)
        params2, _ = flowtron_init(jax.random.PRNGKey(9), n_flows=2,
                                   use_gate_layer=True, **SMALL)
        params3 = warmstart(path, params2, include_layers=["embedding"])
        np.testing.assert_allclose(
            np.asarray(params3["embedding"]["table"]),
            np.asarray(params["embedding"]["table"]))
        # encoder untouched
        assert not np.allclose(
            np.asarray(params3["encoder"]["lstm"]["layers"][0]["fwd"]["w_ih"]),
            np.asarray(params["encoder"]["lstm"]["layers"][0]["fwd"]["w_ih"]))


class TestTrainableMask:
    def test_default_all_trainable(self, model):
        params, _ = model
        mask = trainable_mask(params)
        assert all(_flatten(mask).values())

    def test_finetune_filter(self, model):
        params, _ = model
        mask = trainable_mask(params, ["speaker_embedding"])
        flat = _flatten(mask)
        assert flat["speaker_embedding.table"]
        assert not flat["embedding.table"]

    def test_gm_buffers_frozen(self):
        params, _ = flowtron_init(jax.random.PRNGKey(1), n_flows=1,
                                  n_components=3, fixed_gaussian=True,
                                  mean_scale=1.0, use_gate_layer=True,
                                  **SMALL)
        mask = trainable_mask(params)
        flat = _flatten(mask)
        assert not flat["gaussian_mixture.mean"]
        assert not flat["gaussian_mixture.log_var"]
        assert flat["gaussian_mixture.prob_layer.w"]


class TestAsyncSaver:
    def test_async_save_roundtrip(self, model, tmp_path):
        from flowtron_tpu.train.checkpoints import AsyncSaver
        params, _ = model
        opt = radam(1e-3)
        saver = AsyncSaver()
        path = str(tmp_path / "async_ck")
        saver.save(path, params, opt.init(params), 42, 1e-3)
        saver.wait()
        params2, _ = flowtron_init(jax.random.PRNGKey(3), n_flows=2,
                                   use_gate_layer=True, **SMALL)
        params3, _, it, _ = load_checkpoint(path, params2, opt.init(params2))
        assert it == 42
        np.testing.assert_allclose(
            np.asarray(params3["embedding"]["table"]),
            np.asarray(params["embedding"]["table"]))

    def test_overlapping_saves_serialize(self, model, tmp_path):
        from flowtron_tpu.train.checkpoints import AsyncSaver
        params, _ = model
        opt = radam(1e-3)
        saver = AsyncSaver()
        for i in range(3):
            saver.save(str(tmp_path / f"ck{i}"), params, opt.init(params),
                       i, 1e-3)
        saver.wait()
        import os
        assert sorted(os.listdir(tmp_path)) == ["ck0", "ck1", "ck2"]
