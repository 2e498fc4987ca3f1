"""Model-core tests: flow invertibility (the reference's own oracle,
reference:flowtron.py:932-954), shape contracts, flip helpers, gate logic.

Uses a small-dim config for CPU speed; all code paths are dim-agnostic.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flowtron_tpu.models import (
    flowtron_init, flowtron_forward, flowtron_infer,
    flowtron_test_invertibility,
)
from flowtron_tpu.models.ar_step import (
    ar_step_params, ar_step_forward, ar_step_infer, _flip_time, _flip_prior,
)
from flowtron_tpu.utils.masks import sequence_mask

SMALL = dict(n_speakers=3, n_speaker_dim=8, n_text=185, n_text_dim=32,
             n_mel_channels=12, n_hidden=24, n_attn_channels=16,
             n_lstm_layers=2, mel_encoder_n_hidden=16)


@pytest.fixture(scope="module")
def small_model():
    key = jax.random.PRNGKey(0)
    params, config = flowtron_init(key, n_flows=2, use_gate_layer=True,
                                   **SMALL)
    return params, config


def _randomize_coupling(params, key, scale=0.01):
    """Give the zero-init coupling convs small random weights so the flow
    is non-trivial (zero-init means identity flow)."""
    flows = []
    for i, f in enumerate(params["flows"]):
        k = jax.random.fold_in(key, i)
        f = dict(f)
        f["conv"] = {
            "w": scale * jax.random.normal(k, f["conv"]["w"].shape),
            "b": jnp.zeros_like(f["conv"]["b"]),
        }
        flows.append(f)
    return {**params, "flows": flows}


class TestFlipHelpers:
    def test_flip_time_involution(self):
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((10, 3, 4)).astype(np.float32))
        lengths = jnp.asarray([10, 6, 3])
        mask = sequence_mask(lengths, 10).T[..., None]
        x = x * mask
        flipped = _flip_time(x, lengths)
        # valid prefix is reversed
        np.testing.assert_allclose(np.asarray(flipped)[:6, 1],
                                   np.asarray(x)[:6, 1][::-1], atol=0)
        # padding stays zero
        assert np.asarray(flipped)[6:, 1].max() == 0
        # flip twice = identity
        np.testing.assert_allclose(np.asarray(_flip_time(flipped, lengths)),
                                   np.asarray(x), atol=0)

    def test_flip_prior(self):
        prior = jnp.asarray(np.random.default_rng(1)
                            .uniform(size=(2, 8, 5)).astype(np.float32))
        lengths = jnp.asarray([8, 4])
        f = _flip_prior(prior, lengths)
        np.testing.assert_allclose(np.asarray(f)[1, :4],
                                   np.asarray(prior)[1, :4][::-1], atol=0)


class TestSingleFlowInvertibility:
    def test_ar_step_roundtrip(self):
        """infer(z) then forward(mel) must reproduce z exactly."""
        key = jax.random.PRNGKey(3)
        T, B, Tk = 9, 2, 6
        p = ar_step_params(key, n_mel_channels=8, n_speaker_dim=4,
                           n_text_channels=12, n_hidden=16,
                           n_attn_channels=8, n_lstm_layers=2, add_gate=True)
        p = {**p, "conv": {
            "w": 0.05 * jax.random.normal(key, p["conv"]["w"].shape),
            "b": 0.01 * jax.random.normal(key, p["conv"]["b"].shape)}}
        text = jax.random.normal(jax.random.fold_in(key, 1), (Tk, B, 16))
        z = jax.random.normal(jax.random.fold_in(key, 2), (T, B, 8))

        mel, attn_w, n_valid = ar_step_infer(p, z, text,
                                             gate_threshold=1e6)
        assert int(n_valid.min()) == T  # gate never fires at 1e6

        z_recon, log_s, gates, attn, logprob = ar_step_forward(
            p, mel, text, key_mask=None, out_mask=None)
        np.testing.assert_allclose(np.asarray(z_recon), np.asarray(z),
                                   atol=2e-5)

    def test_forward_attention_matches_infer(self):
        """Teacher-forced attention == scan attention on the same mel."""
        key = jax.random.PRNGKey(4)
        T, B, Tk = 7, 1, 5
        p = ar_step_params(key, n_mel_channels=8, n_speaker_dim=4,
                           n_text_channels=12, n_hidden=16,
                           n_attn_channels=8, n_lstm_layers=2,
                           add_gate=False)
        text = jax.random.normal(jax.random.fold_in(key, 1), (Tk, B, 16))
        z = jax.random.normal(jax.random.fold_in(key, 2), (T, B, 8))
        mel, attn_infer, _ = ar_step_infer(p, z, text)
        _, _, _, attn_fwd, _ = ar_step_forward(p, mel, text, None, None)
        np.testing.assert_allclose(np.asarray(attn_infer),
                                   np.asarray(attn_fwd), atol=1e-5)


class TestFlowtron:
    def test_forward_shapes(self, small_model):
        params, config = small_model
        B, T, Tk, M = 2, 11, 7, SMALL["n_mel_channels"]
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal((B, M, T)).astype(np.float32))
        text = jnp.asarray(rng.integers(0, 185, (B, Tk)))
        sids = jnp.asarray([0, 1])
        in_lens = jnp.asarray([7, 5])
        out_lens = jnp.asarray([11, 8])
        prior = jnp.asarray(rng.uniform(0.1, 1, (B, T, Tk)).astype(np.float32))

        (z, log_s_list, gate, attns, logprobs, mean, log_var, prob) = \
            flowtron_forward(params, config, mel, sids, text, in_lens,
                             out_lens, attn_prior=prior)
        assert z.shape == (T, B, M)
        assert len(log_s_list) == 2
        assert log_s_list[0].shape == (T, B, M)
        assert gate.shape == (T, B, 1)
        assert attns[0].shape == (B, T, Tk)
        assert logprobs[0].shape == (B, T, Tk)
        assert mean is None  # n_components=0

    def test_invertibility(self, small_model):
        """The defining flow property: infer∘forward error ~<= 1e-5."""
        params, config = small_model
        params = _randomize_coupling(params, jax.random.PRNGKey(9), 0.05)
        B, N, Tk, M = 1, 10, 6, SMALL["n_mel_channels"]
        rng = np.random.default_rng(5)
        residual = jnp.asarray(
            (rng.standard_normal((B, M, N)) * 0.5).astype(np.float32))
        text = jnp.asarray(rng.integers(0, 185, (B, Tk)))
        sids = jnp.asarray([1])

        err = flowtron_test_invertibility(params, config, residual, sids,
                                          text)
        assert float(err) < 1e-5, f"invertibility error {float(err)}"

    @pytest.mark.parametrize("n_flows", [3, 4])
    def test_invertibility_more_flows(self, n_flows):
        """n_flows is a free hyperparameter (reference:flowtron.py:853-868
        alternates fwd/back steps for any count); the flow property must
        hold beyond the shipped 1- and 2-flow configs."""
        params, config = flowtron_init(jax.random.PRNGKey(2),
                                       n_flows=n_flows,
                                       use_gate_layer=True, **SMALL)
        params = _randomize_coupling(params, jax.random.PRNGKey(9), 0.05)
        B, N, Tk, M = 1, 8, 5, SMALL["n_mel_channels"]
        rng = np.random.default_rng(5)
        residual = jnp.asarray(
            (rng.standard_normal((B, M, N)) * 0.5).astype(np.float32))
        text = jnp.asarray(rng.integers(0, 185, (B, Tk)))
        sids = jnp.asarray([1])
        err = flowtron_test_invertibility(params, config, residual, sids,
                                          text)
        assert float(err) < 1e-5, f"n_flows={n_flows}: {float(err)}"

    def test_infer_shapes_and_gate(self, small_model):
        params, config = small_model
        B, N, Tk, M = 2, 9, 5, SMALL["n_mel_channels"]
        rng = np.random.default_rng(7)
        residual = jnp.asarray(
            (rng.standard_normal((B, M, N)) * 0.5).astype(np.float32))
        text = jnp.asarray(rng.integers(0, 185, (B, Tk)))
        sids = jnp.asarray([0, 2])

        mel, attns, n_valid = flowtron_infer(params, config, residual, sids,
                                             text, gate_threshold=0.5)
        assert mel.shape == (B, M, N)
        assert len(attns) == 2
        assert attns[0].shape == (B, N, Tk)
        assert n_valid.shape == (B,)
        assert (np.asarray(n_valid) >= 1).all()
        assert (np.asarray(n_valid) <= N).all()

    def test_gate_threshold_zero_stops_immediately(self, small_model):
        params, config = small_model
        B, N, Tk, M = 1, 6, 4, SMALL["n_mel_channels"]
        rng = np.random.default_rng(8)
        residual = jnp.asarray(rng.standard_normal((B, M, N)).astype(np.float32))
        text = jnp.asarray(rng.integers(0, 185, (B, Tk)))
        sids = jnp.asarray([0])
        _, _, n_valid = flowtron_infer(params, config, residual, sids, text,
                                       gate_threshold=0.0)
        # sigmoid > 0 always -> first frame hits the gate
        assert int(n_valid[0]) == 1

    def test_padding_invariance(self, small_model):
        """Extra mel/text padding must not change z in the valid region."""
        params, config = small_model
        params = _randomize_coupling(params, jax.random.PRNGKey(10), 0.05)
        B, T, Tk, M = 1, 8, 5, SMALL["n_mel_channels"]
        rng = np.random.default_rng(11)
        mel = rng.standard_normal((B, M, T)).astype(np.float32)
        text = rng.integers(1, 185, (B, Tk))
        sids = jnp.asarray([0])
        in_lens = jnp.asarray([Tk])
        out_lens = jnp.asarray([T])

        z1, ls1, *_ = flowtron_forward(params, config, jnp.asarray(mel),
                                       sids, jnp.asarray(text), in_lens,
                                       out_lens)

        mel_pad = np.concatenate([mel, np.zeros((B, M, 3), np.float32)], 2)
        text_pad = np.concatenate([text, np.zeros((B, 2), np.int64)], 1)
        z2, ls2, *_ = flowtron_forward(params, config, jnp.asarray(mel_pad),
                                       sids, jnp.asarray(text_pad), in_lens,
                                       out_lens)
        np.testing.assert_allclose(np.asarray(z2)[:T, 0],
                                   np.asarray(z1)[:, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(ls2[0])[:T, 0],
                                   np.asarray(ls1[0])[:, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(ls2[1])[:T, 0],
                                   np.asarray(ls1[1])[:, 0], atol=1e-5)

    def test_gm_mode(self):
        key = jax.random.PRNGKey(12)
        params, config = flowtron_init(key, n_flows=1, use_gate_layer=True,
                                       n_components=4, fixed_gaussian=True,
                                       mean_scale=2.0, **SMALL)
        B, T, Tk, M = 2, 6, 4, SMALL["n_mel_channels"]
        rng = np.random.default_rng(13)
        mel = jnp.asarray(rng.standard_normal((B, M, T)).astype(np.float32))
        text = jnp.asarray(rng.integers(0, 185, (B, Tk)))
        sids = jnp.asarray([0, 1])
        (z, _, _, _, _, mean, log_var, prob) = flowtron_forward(
            params, config, mel, sids, text, jnp.asarray([4, 3]),
            jnp.asarray([6, 5]))
        assert mean.shape == (1, M, 4)
        assert log_var.shape == (1, M, 4)
        assert prob.shape == (B, 4)
        np.testing.assert_allclose(np.asarray(prob).sum(1), 1.0, atol=1e-5)


class TestGatedBatchedInference:
    """VERDICT r1 hygiene: gate-enabled inference at batch > 1 must keep
    the reference's truncated-prefix semantics — the gated (last) flow
    runs first in inverse order and breaks at the gate, and every later
    flow consumes only the truncated prefix
    (reference:flowtron.py:823-825, 629-642)."""

    def _setup(self):
        params, config = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                       use_gate_layer=True, **SMALL)
        params = _randomize_coupling(params, jax.random.PRNGKey(1),
                                     scale=0.05)
        # project the decoder input uniformly so the gate trace varies
        # mid-utterance (seeded: thresholds below give per-element
        # immediate / mid-sequence / no gate hits)
        gate = params["flows"][-1]["gate_layer"]
        gate["w"] = jnp.ones_like(gate["w"]) * 0.2

        rng = np.random.default_rng(2)
        B, N = 3, 24
        residual = jnp.asarray(
            (rng.standard_normal((B, 12, N)) * 0.8).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 185, (B, 9)))
        sids = jnp.asarray([0, 1, 2])
        return params, config, residual, sids, text, N

    def test_truncated_prefix_semantics(self):
        params, config, residual, sids, text, N = self._setup()
        mel, _, n_valid = flowtron_infer(params, config, residual, sids,
                                         text, gate_threshold=0.3)
        n_valid = np.asarray(n_valid)
        # immediate hit, mid-sequence hit, and no hit in one batch
        assert n_valid[0] == 1 and 1 < n_valid[1] < N and n_valid[2] == N

        for b in range(residual.shape[0]):
            nb = int(n_valid[b])
            # reference semantics: the gated flow is a BACK step, so its
            # scan consumes the time-flipped residual and the break keeps
            # the transforms of the LAST n_valid residual frames
            # (reference:flowtron.py:629-642 flips, then 823-825 breaks);
            # later flows see only that truncated prefix. A gate-disabled
            # run on the last nb residual frames must therefore reproduce
            # the batched run's valid frames exactly.
            mel_ref, _, nv_ref = flowtron_infer(
                params, config, residual[b:b + 1, :, N - nb:],
                sids[b:b + 1], text[b:b + 1], gate_threshold=1e6)
            assert int(nv_ref[0]) == nb
            np.testing.assert_allclose(
                np.asarray(mel[b, :, :nb]), np.asarray(mel_ref[0]),
                atol=2e-5, err_msg=f"batch element {b}")

    def test_batched_matches_single_sample_gating(self):
        params, config, residual, sids, text, _ = self._setup()
        _, _, n_valid = flowtron_infer(params, config, residual, sids,
                                       text, gate_threshold=0.3)
        for b in range(residual.shape[0]):
            _, _, nv1 = flowtron_infer(
                params, config, residual[b:b + 1], sids[b:b + 1],
                text[b:b + 1], gate_threshold=0.3)
            assert int(nv1[0]) == int(n_valid[b]), f"element {b}"


class TestCummAttention:
    def test_invertibility_with_cumm_attention(self):
        key = jax.random.PRNGKey(20)
        params, config = flowtron_init(key, n_flows=2, use_gate_layer=True,
                                       use_cumm_attention=True, **SMALL)
        params = _randomize_coupling(params, jax.random.PRNGKey(21), 0.05)
        assert "attn_cond_layer" in params["flows"][0]
        rng = np.random.default_rng(22)
        B, N, Tk, M = 1, 8, 5, SMALL["n_mel_channels"]
        residual = jnp.asarray(
            (rng.standard_normal((B, M, N)) * 0.5).astype(np.float32))
        text = jnp.asarray(rng.integers(0, 185, (B, Tk)))
        err = flowtron_test_invertibility(params, config, residual,
                                          jnp.asarray([0]), text)
        assert float(err) < 1e-5, float(err)

    def test_forward_matches_infer_attention(self):
        """Cumm-attention teacher-forced scan == inference scan."""
        key = jax.random.PRNGKey(23)
        p = ar_step_params(key, n_mel_channels=8, n_speaker_dim=4,
                           n_text_channels=12, n_hidden=16,
                           n_attn_channels=8, n_lstm_layers=2,
                           add_gate=False, use_cumm_attention=True)
        T, B, Tk = 6, 1, 4
        text = jax.random.normal(jax.random.fold_in(key, 1), (Tk, B, 16))
        z = jax.random.normal(jax.random.fold_in(key, 2), (T, B, 8))
        mel, attn_infer, _ = ar_step_infer(p, z, text)
        _, _, _, attn_fwd, _ = ar_step_forward(p, mel, text, None, None)
        np.testing.assert_allclose(np.asarray(attn_infer),
                                   np.asarray(attn_fwd), atol=1e-5)


class TestExternalAttention:
    def test_attns_roundtrip(self, small_model):
        """Supplying the attention maps a previous run produced gives the
        same mel (reference:flowtron.py:901-929 attns= contract)."""
        params, config = small_model
        rng = np.random.default_rng(30)
        B, N, Tk, M = 1, 8, 5, SMALL["n_mel_channels"]
        residual = jnp.asarray(
            (rng.standard_normal((B, M, N)) * 0.5).astype(np.float32))
        text = jnp.asarray(rng.integers(0, 185, (B, Tk)))
        sids = jnp.asarray([0])

        mel1, attns, _ = flowtron_infer(params, config, residual, sids,
                                        text, gate_threshold=1e6)
        # feed the recorded maps back, in forward-flow order:
        # attns returned reversed-visit order -> reference expects
        # attns list s.t. reversed(attns)[i] matches visit i
        attns_fwd_order = [jnp.asarray(a) for a in reversed(attns)]
        mel2, attns2, _ = flowtron_infer(params, config, residual, sids,
                                         text, gate_threshold=1e6,
                                         attns=attns_fwd_order)
        np.testing.assert_allclose(np.asarray(mel2), np.asarray(mel1),
                                   atol=1e-5)
