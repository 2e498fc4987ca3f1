"""Orbax checkpoint backend (train_config.checkpoint_format="orbax")
under a 4x2 (data x model) mesh: roundtrip, sharding-aware restore,
warmstart/ignore_layers semantics, async save.
"""

import os

import numpy as np
import pytest
import jax

from flowtron_tpu.models import flowtron_init
from flowtron_tpu.parallel.mesh import make_mesh, place_params
from flowtron_tpu.train.checkpoints import (
    AsyncSaver, save_checkpoint, load_checkpoint, warmstart,
    trainable_mask, _flatten,
)
from flowtron_tpu.train.radam import build_optimizer, masked_optimizer
from flowtron_tpu.train.orbax_ckpt import is_orbax_checkpoint

SMALL = dict(n_speakers=2, n_speaker_dim=4, n_text=185, n_text_dim=16,
             n_mel_channels=8, n_hidden=12, n_attn_channels=8,
             n_lstm_layers=2, mel_encoder_n_hidden=8)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((4, 2), ("data", "model"))


def _state(mesh, seed):
    params, _ = flowtron_init(jax.random.PRNGKey(seed), n_flows=2,
                              use_gate_layer=True, **SMALL)
    params = place_params(params, mesh)
    opt = masked_optimizer(build_optimizer("RAdam", 1e-3, 1e-6, 1.0),
                           trainable_mask(params))
    return params, jax.jit(opt.init)(params)


def _assert_trees_equal(a, b):
    fa, fb = _flatten(a), _flatten(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                      err_msg=k)


class TestOrbaxBackend:
    def test_roundtrip_under_tp_mesh(self, mesh, tmp_path):
        params, opt_state = _state(mesh, seed=0)
        path = str(tmp_path / "orbax_ckpt")
        save_checkpoint(path, params, opt_state, 7, 1e-3, config={"x": 1},
                        fmt="orbax")
        assert is_orbax_checkpoint(path)

        fresh, fresh_opt = _state(mesh, seed=1)
        restored, r_opt, it, lr = load_checkpoint(path, fresh, fresh_opt)
        assert it == 7 and lr == 1e-3
        _assert_trees_equal(restored, params)
        _assert_trees_equal(r_opt, opt_state)

    def test_restore_preserves_target_sharding(self, mesh, tmp_path):
        params, opt_state = _state(mesh, seed=0)
        path = str(tmp_path / "orbax_ckpt")
        save_checkpoint(path, params, opt_state, 0, 1e-3, fmt="orbax")

        fresh, fresh_opt = _state(mesh, seed=1)
        restored, _, _, _ = load_checkpoint(path, fresh, fresh_opt)
        found = False
        for name, leaf in _flatten(fresh).items():
            if isinstance(leaf, jax.Array) and not leaf.is_fully_replicated:
                rl = _flatten(restored)[name]
                assert rl.sharding == leaf.sharding, name
                found = True
        assert found, "no TP-sharded leaf exercised"

    def test_warmstart_include_filter(self, mesh, tmp_path):
        params, opt_state = _state(mesh, seed=0)
        path = str(tmp_path / "orbax_ckpt")
        save_checkpoint(path, params, opt_state, 0, 1e-3, fmt="orbax")

        fresh, _ = _state(mesh, seed=1)
        out = warmstart(path, fresh, include_layers=["embedding"])
        f_out, f_saved, f_fresh = (_flatten(t) for t in
                                   (out, params, fresh))
        for k in f_out:
            want = f_saved if "embedding" in k else f_fresh
            np.testing.assert_array_equal(np.asarray(f_out[k]),
                                          np.asarray(want[k]), err_msg=k)

    def test_ignore_layers_keeps_fresh_and_skips_optimizer(self, mesh,
                                                           tmp_path):
        params, opt_state = _state(mesh, seed=0)
        path = str(tmp_path / "orbax_ckpt")
        save_checkpoint(path, params, opt_state, 5, 1e-3, fmt="orbax")

        fresh, fresh_opt = _state(mesh, seed=1)
        ignored = "embedding.table"
        restored, r_opt, _, _ = load_checkpoint(path, fresh, fresh_opt,
                                                ignore_layers=[ignored])
        f_r, f_saved, f_fresh = (_flatten(t) for t in
                                 (restored, params, fresh))
        np.testing.assert_array_equal(np.asarray(f_r[ignored]),
                                      np.asarray(f_fresh[ignored]))
        np.testing.assert_array_equal(
            np.asarray(f_r["speaker_embedding.table"]),
            np.asarray(f_saved["speaker_embedding.table"]))
        assert r_opt is fresh_opt  # reference:train.py:116-123

    def test_async_saver(self, mesh, tmp_path):
        params, opt_state = _state(mesh, seed=0)
        path = str(tmp_path / "orbax_async")
        saver = AsyncSaver()
        saver.save(path, params, opt_state, 3, 2e-4, fmt="orbax")
        saver.wait()
        assert is_orbax_checkpoint(path)
        fresh, fresh_opt = _state(mesh, seed=1)
        restored, _, it, lr = load_checkpoint(path, fresh, fresh_opt)
        assert it == 3 and lr == 2e-4
        _assert_trees_equal(restored, params)

    def test_marker_not_written_until_state_durable(self, mesh, tmp_path):
        """meta.json (the format marker) lands only after the async state
        write finishes — a crashed save never looks like a checkpoint."""
        params, opt_state = _state(mesh, seed=0)
        path = str(tmp_path / "orbax_atomic")
        from flowtron_tpu.train.orbax_ckpt import save_orbax
        ckptr, finalize = save_orbax(path, params, opt_state, 1, 1e-3,
                                     use_async=True)
        assert not is_orbax_checkpoint(path)
        ckptr.wait_until_finished()
        finalize()
        ckptr.close()
        assert is_orbax_checkpoint(path)
        assert os.path.exists(os.path.join(path, "state"))


class TestInterruptedSwap:
    def test_heal_from_tmp(self, tmp_path):
        """Crash between finalize's two renames: the complete new
        checkpoint sits at .ockpt_tmp with nothing at the path; the
        next is_orbax_checkpoint() must complete the swap."""
        import os
        import jax.numpy as jnp
        from flowtron_tpu.train.orbax_ckpt import (
            save_orbax, restore_orbax, is_orbax_checkpoint)

        params = {"w": jnp.arange(6, dtype=jnp.float32)}
        d = str(tmp_path / "ck")
        save_orbax(d, params, None, 7, 1e-3)
        # simulate the crash window: new checkpoint stranded at tmp
        os.rename(d, d + ".ockpt_tmp")
        assert not os.path.exists(d)

        assert is_orbax_checkpoint(d)  # heals
        out = restore_orbax(d, params)
        assert out["iteration"] == 7
        assert not os.path.exists(d + ".ockpt_tmp")
