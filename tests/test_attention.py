"""Additive attention parity vs a torch oracle + prior/masking semantics."""

import numpy as np
import torch
import jax.numpy as jnp

from flowtron_tpu.models.attention import attention_params, attention_forward

RNG = np.random.default_rng(3)


def torch_oracle(q_w, k_w, v_w, vec_w, queries, keys, values, key_mask,
                 attn_prior=None, temperature=1.0):
    """Reference-style computation (reference:flowtron.py:559-592) in torch."""
    q = torch.from_numpy(queries) @ torch.from_numpy(q_w)   # (Tq,B,D)
    k = torch.from_numpy(keys) @ torch.from_numpy(k_w)
    vals = torch.from_numpy(values) @ torch.from_numpy(v_w)
    q, k, vals = q.transpose(0, 1), k.transpose(0, 1), vals.transpose(0, 1)
    scores = torch.tanh(q[:, :, None] + k[:, None]) @ torch.from_numpy(vec_w)
    scores = scores[..., 0] / temperature
    if key_mask is not None:
        scores = scores.masked_fill(
            ~torch.from_numpy(key_mask)[:, None, :], -float("inf"))
    attn = torch.softmax(scores, dim=2)
    if attn_prior is not None:
        log_post = torch.log(attn + 1e-20) + \
            torch.log(torch.from_numpy(attn_prior) + 1e-20)
        logprob = log_post.clone()
        if key_mask is not None:
            log_post = log_post.masked_fill(
                ~torch.from_numpy(key_mask)[:, None, :], -float("inf"))
        attn = torch.softmax(log_post, dim=2)
    else:
        logprob = torch.log(attn + 1e-8)
    ctx = torch.bmm(attn, vals).transpose(1, 2)
    return (ctx.numpy(), attn.numpy(), logprob.numpy())


def _setup(Tq=7, Tk=5, B=2, Dq=12, Dk=10, Da=8):
    params = attention_params(jnp.asarray(np.array([0, 1], np.uint32)),
                              n_query_dim=Dq, n_speaker_dim=0,
                              n_text_channels=Dk, n_att_channels=Da)
    queries = RNG.standard_normal((Tq, B, Dq)).astype(np.float32)
    keys = RNG.standard_normal((Tk, B, Dk)).astype(np.float32)
    key_mask = np.array([[True] * Tk, [True, True, True, False, False]])
    return params, queries, keys, key_mask


def _weights(params):
    return (np.asarray(params["query"]["w"]),
            np.asarray(params["key"]["w"]),
            np.asarray(params["value"]["w"]),
            np.asarray(params["v"]["w"]))


class TestAttention:
    def test_masked_no_prior(self):
        params, queries, keys, key_mask = _setup()
        ctx, attn, logprob = attention_forward(
            params, jnp.asarray(queries), jnp.asarray(keys),
            jnp.asarray(keys), key_mask=jnp.asarray(key_mask))

        q_w, k_w, v_w, vec_w = _weights(params)
        ref_ctx, ref_attn, ref_lp = torch_oracle(
            q_w, k_w, v_w, vec_w, queries, keys, keys, key_mask)
        np.testing.assert_allclose(np.asarray(attn), ref_attn, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ctx), ref_ctx, atol=1e-5)
        np.testing.assert_allclose(np.asarray(logprob), ref_lp, atol=1e-4)

    def test_with_prior(self):
        params, queries, keys, key_mask = _setup()
        Tq, B, Tk = queries.shape[0], queries.shape[1], keys.shape[0]
        prior = RNG.uniform(0.01, 1.0, (B, Tq, Tk)).astype(np.float32)
        prior /= prior.sum(-1, keepdims=True)

        ctx, attn, logprob = attention_forward(
            params, jnp.asarray(queries), jnp.asarray(keys),
            jnp.asarray(keys), key_mask=jnp.asarray(key_mask),
            attn_prior=jnp.asarray(prior))

        q_w, k_w, v_w, vec_w = _weights(params)
        ref_ctx, ref_attn, ref_lp = torch_oracle(
            q_w, k_w, v_w, vec_w, queries, keys, keys, key_mask,
            attn_prior=prior)
        np.testing.assert_allclose(np.asarray(attn), ref_attn, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ctx), ref_ctx, atol=1e-5)
        np.testing.assert_allclose(np.asarray(logprob), ref_lp, atol=1e-4)

    def test_attention_rows_sum_to_one(self):
        params, queries, keys, key_mask = _setup()
        _, attn, _ = attention_forward(
            params, jnp.asarray(queries), jnp.asarray(keys),
            jnp.asarray(keys), key_mask=jnp.asarray(key_mask))
        np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-5)
        # no mass on masked keys
        assert np.asarray(attn)[1, :, 3:].max() < 1e-6

    def test_temperature(self):
        params, queries, keys, key_mask = _setup()
        _, attn_hot, _ = attention_forward(
            params, jnp.asarray(queries), jnp.asarray(keys),
            jnp.asarray(keys), temperature=0.25)
        _, attn_cold, _ = attention_forward(
            params, jnp.asarray(queries), jnp.asarray(keys),
            jnp.asarray(keys), temperature=4.0)
        # lower temperature -> sharper distribution
        ent_hot = -(np.asarray(attn_hot) *
                    np.log(np.asarray(attn_hot) + 1e-9)).sum(-1).mean()
        ent_cold = -(np.asarray(attn_cold) *
                     np.log(np.asarray(attn_cold) + 1e-9)).sum(-1).mean()
        assert ent_hot < ent_cold

    def test_external_attn(self):
        params, queries, keys, key_mask = _setup()
        Tq, B, Tk = queries.shape[0], queries.shape[1], keys.shape[0]
        ext = RNG.uniform(0, 1, (B, Tq, Tk)).astype(np.float32)
        ext /= ext.sum(-1, keepdims=True)
        ctx, attn, logprob = attention_forward(
            params, jnp.asarray(queries), jnp.asarray(keys),
            jnp.asarray(keys), attn=jnp.asarray(ext))
        assert logprob is None
        np.testing.assert_allclose(np.asarray(attn), ext)
