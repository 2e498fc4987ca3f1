"""Sharded (orbax-style) checkpoint tests under a 4x2 (data x model) mesh.

VERDICT r1 item 7: per-shard save + sharding-aware lazy restore with the
same warmstart / ignore_layers / finetune semantics as the pickle format
(SURVEY §5 "periodic async checkpoint (orbax-style)").
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from flowtron_tpu.models import flowtron_init
from flowtron_tpu.parallel.mesh import make_mesh, place_params
from flowtron_tpu.train.checkpoints import (
    AsyncSaver, save_checkpoint, load_checkpoint, warmstart,
    trainable_mask, _flatten,
)
from flowtron_tpu.train.radam import build_optimizer, masked_optimizer
from flowtron_tpu.train.sharded_ckpt import (
    save_sharded, restore_sharded, restore_flat, read_index,
)

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
    opt = masked_optimizer(
        build_optimizer("RAdam", 1e-3, 1e-6, 1.0),
                       trainable_mask(params))
    opt_state = jax.jit(opt.init)(params)
    return params, opt_state, opt


def _assert_trees_equal(a, b):
    fa, fb = _flatten(a), _flatten(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                      err_msg=k)


def _a_tp_sharded_leaf(params):
    """Some flat param that place_params put on the model axis."""
    for name, leaf in _flatten(params).items():
        if isinstance(leaf, jax.Array) and not leaf.is_fully_replicated:
            return name, leaf
    raise AssertionError("no TP-sharded leaf found")


class TestShardedRoundtrip:
    def test_roundtrip_under_tp_mesh(self, mesh, tmp_path):
        params, opt_state, _ = _state(mesh, seed=0)
        path = str(tmp_path / "ckpt_dir")
        save_checkpoint(path, params, opt_state, 7, 1e-3, config={"x": 1},
                        sharded=True)

        fresh_params, fresh_opt, _ = _state(mesh, seed=1)
        restored, r_opt, it, lr = load_checkpoint(path, fresh_params,
                                                  fresh_opt)
        assert it == 7 and lr == 1e-3
        _assert_trees_equal(restored, params)
        _assert_trees_equal(r_opt, opt_state)

    def test_restore_preserves_target_sharding(self, mesh, tmp_path):
        params, opt_state, _ = _state(mesh, seed=0)
        path = str(tmp_path / "ckpt_dir")
        save_sharded(path, params, opt_state, 0, 1e-3)

        fresh_params, fresh_opt, _ = _state(mesh, seed=1)
        payload = restore_sharded(path, fresh_params, fresh_opt)
        name, template_leaf = _a_tp_sharded_leaf(fresh_params)
        restored_leaf = _flatten(payload["params"])[name]
        assert isinstance(restored_leaf, jax.Array)
        assert restored_leaf.sharding == template_leaf.sharding
        np.testing.assert_array_equal(np.asarray(restored_leaf),
                                      np.asarray(_flatten(params)[name]))

    def test_per_shard_files(self, mesh, tmp_path):
        params, opt_state, _ = _state(mesh, seed=0)
        path = str(tmp_path / "ckpt_dir")
        save_sharded(path, params, opt_state, 0, 1e-3)
        index = read_index(path)

        name, leaf = _a_tp_sharded_leaf(params)
        meta = index["arrays"][name]
        # model axis = 2 -> exactly 2 unique shard files, each half the
        # columns; DP replicas must be deduplicated
        assert len(meta["shards"]) == 2
        cols = leaf.shape[1]
        spans = sorted(tuple(s["index"][1]) for s in meta["shards"])
        assert spans == [(0, cols // 2), (cols // 2, cols)]
        for s in meta["shards"]:
            data = np.load(os.path.join(path, s["file"]))
            assert data.shape[1] == cols // 2

    def test_bf16_leaf_roundtrip(self, tmp_path):
        tree = {"w": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3),
                "b": jnp.ones((3,), jnp.float32)}
        path = str(tmp_path / "bf16_dir")
        save_sharded(path, tree, None, 0, 1e-3)
        flat = restore_flat(path)
        assert flat["w"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(flat["w"], np.float32),
                                      np.asarray(tree["w"], np.float32))


class TestShardedSemantics:
    def test_warmstart_include_filter(self, mesh, tmp_path):
        params, opt_state, _ = _state(mesh, seed=0)
        path = str(tmp_path / "ckpt_dir")
        save_sharded(path, params, opt_state, 0, 1e-3)

        fresh, _, _ = _state(mesh, seed=1)
        out = warmstart(path, fresh, include_layers=["embedding"])
        f_out, f_saved, f_fresh = (_flatten(t) for t in
                                   (out, params, fresh))
        for k in f_out:
            want = f_saved if "embedding" in k else f_fresh
            np.testing.assert_array_equal(np.asarray(f_out[k]),
                                          np.asarray(want[k]), err_msg=k)

    def test_ignore_layers_keeps_fresh_and_skips_optimizer(self, mesh,
                                                           tmp_path):
        params, opt_state, _ = _state(mesh, seed=0)
        path = str(tmp_path / "ckpt_dir")
        save_sharded(path, params, opt_state, 5, 1e-3)

        fresh, fresh_opt, _ = _state(mesh, seed=1)
        ignored = "embedding.table"
        restored, r_opt, _, _ = load_checkpoint(path, fresh, fresh_opt,
                                                ignore_layers=[ignored])
        f_r, f_saved, f_fresh = (_flatten(t) for t in
                                 (restored, params, fresh))
        np.testing.assert_array_equal(np.asarray(f_r[ignored]),
                                      np.asarray(f_fresh[ignored]))
        some_other = "speaker_embedding.table"
        np.testing.assert_array_equal(np.asarray(f_r[some_other]),
                                      np.asarray(f_saved[some_other]))
        # optimizer state must stay fresh (reference:train.py:116-123)
        assert r_opt is fresh_opt

    def test_async_saver_sharded(self, mesh, tmp_path):
        params, opt_state, _ = _state(mesh, seed=0)
        path = str(tmp_path / "async_dir")
        saver = AsyncSaver()
        saver.save(path, params, opt_state, 3, 2e-4, sharded=True)
        saver.wait()
        fresh, fresh_opt, _ = _state(mesh, seed=1)
        restored, _, it, lr = load_checkpoint(path, fresh, fresh_opt)
        assert it == 3 and lr == 2e-4
        _assert_trees_equal(restored, params)


class TestMissingShardDetection:
    def test_incomplete_checkpoint_raises(self, tmp_path):
        """A checkpoint whose index lists a shard region with no backing
        coverage must raise, never restore np.empty garbage."""
        import json
        from flowtron_tpu.train.sharded_ckpt import (
            save_sharded, restore_sharded, read_index)

        params = {"w": jnp.arange(32, dtype=jnp.float32).reshape(4, 8)}
        d = str(tmp_path / "ck")
        save_sharded(d, params, None, 3, 1e-3)

        # drop the saved region from the index and replace it with a
        # half-size one (simulating a partial multi-host save)
        index = read_index(d)
        meta = index["arrays"]["w"]
        sh = meta["shards"][0]
        sh["index"] = [[0, 4], [0, 4]]  # covers only half the columns
        with open(os.path.join(d, "index.json"), "w") as f:
            json.dump(index, f)

        with pytest.raises(ValueError, match="do not cover"):
            restore_sharded(d, params)
