"""Content-based additive (tanh) attention.

Matches the reference semantics (reference:flowtron.py:528-592):
score = v · tanh(q + k) / temperature, softmax over text positions, optional
beta-binomial prior posterior with the pre-softmax log-posterior kept for
the CTC alignment loss.

TPU formulation: the reference materializes a (B, Tq, Tk, D) tensor
(reference:flowtron.py:572). Here the score is written as a broadcast
add + tanh + weighted reduction, which XLA fuses into a single loop
fusion whose only HBM output is the (B, Tq, Tk) score matrix.
"""

import jax
import jax.numpy as jnp

from flowtron_tpu.models.layers import linear_params, linear_apply

MASK_VALUE = -1e30


def attention_params(key, n_query_dim=1024, n_speaker_dim=128,
                     n_text_channels=512, n_att_channels=640,
                     dtype=jnp.float32):
    kq, kk, kv, kvec = jax.random.split(key, 4)
    kd = n_text_channels + n_speaker_dim
    return {
        "query": linear_params(kq, n_query_dim, n_att_channels, bias=False,
                               w_init_gain="tanh", dtype=dtype),
        "key": linear_params(kk, kd, n_att_channels, bias=False,
                             w_init_gain="tanh", dtype=dtype),
        "value": linear_params(kv, kd, n_att_channels, bias=False,
                               w_init_gain="tanh", dtype=dtype),
        "v": linear_params(kvec, n_att_channels, 1, bias=False,
                           w_init_gain="tanh", dtype=dtype),
    }


def attention_scores(params, queries_proj, keys_proj, temperature=1.0):
    """(B, Tq, D), (B, Tk, D) -> (B, Tq, Tk) additive scores.

    Dispatches to the Pallas VMEM-tiled kernel on real TPUs (custom VJP,
    ~12% over the XLA loop fusion at flagship shapes); otherwise the
    fused broadcast-tanh-reduce — either way no (B, Tq, Tk, D) HBM
    intermediate.
    """
    from flowtron_tpu.ops import attention_pallas as ap

    v_w = params["v"]["w"][:, 0]  # (D,)
    if ap.use_pallas_default(queries_proj.shape[-1]):
        return ap.attention_scores(queries_proj, keys_proj, v_w, temperature)
    return ap.attention_scores_xla(queries_proj, keys_proj, v_w, temperature)


def attention_forward(params, queries, keys, values, key_mask=None,
                      attn_prior=None, temperature=1.0, attn=None):
    """Full attention over a sequence of queries.

    Args:
      params: attention parameter pytree.
      queries: (Tq, B, n_query_dim) attention-LSTM outputs (time-major).
      keys/values: (Tk, B, text+speaker dim) encoder outputs.
      key_mask: (B, Tk) bool, True at valid text positions.
      attn_prior: (B, Tq, Tk) beta-binomial prior or None.
      temperature: score divisor (inference control).
      attn: externally supplied attention map (B, Tq, Tk) or None.

    Returns:
      context (B, D_att, Tq), attn (B, Tq, Tk), attn_logprob (or None when
      attn was supplied).
    """
    vals = linear_apply(params["value"], values).transpose(1, 0, 2)  # (B,Tk,D)

    if attn is None:
        q = linear_apply(params["query"], queries).transpose(1, 0, 2)
        k = linear_apply(params["key"], keys).transpose(1, 0, 2)
        scores = attention_scores(params, q, k, temperature)

        if key_mask is not None:
            scores = jnp.where(key_mask[:, None, :], scores, MASK_VALUE)
        attn = jax.nn.softmax(scores, axis=2)

        if attn_prior is not None:
            log_post = jnp.log(attn.astype(jnp.float32) + 1e-20) \
                + jnp.log(attn_prior.astype(jnp.float32) + 1e-20)
            attn_logprob = log_post  # pre-mask, kept for the CTC loss
            if key_mask is not None:
                log_post = jnp.where(key_mask[:, None, :], log_post, MASK_VALUE)
            attn = jax.nn.softmax(log_post, axis=2)
        else:
            attn_logprob = jnp.log(attn.astype(jnp.float32) + 1e-8)
    else:
        attn_logprob = None

    context = jnp.einsum("bqk,bkd->bqd", attn, vals)
    return context.transpose(0, 2, 1), attn, attn_logprob


def attention_conditioning_params(key, input_dim=2, attention_n_filters=32,
                                  attention_kernel_sizes=(5, 3),
                                  attention_dim=640, dtype=jnp.float32):
    """2-layer conv over concat(prev attn, cumulative attn) that gates the
    text keys (reference:flowtron.py:129-152, Tacotron location-layer
    analog)."""
    from flowtron_tpu.models.layers import conv1d_params
    k1, k2 = jax.random.split(key)
    return {
        "conv_hidden": conv1d_params(k1, input_dim, attention_n_filters,
                                     attention_kernel_sizes[0],
                                     w_init_gain="relu", dtype=dtype),
        "conv_out": conv1d_params(k2, attention_n_filters, attention_dim,
                                  attention_kernel_sizes[1],
                                  w_init_gain="sigmoid", dtype=dtype),
    }


def attention_conditioning_apply(params, attn_cat):
    """attn_cat: (B, 2, Tk) -> (B, attention_dim, Tk) sigmoid gates."""
    from flowtron_tpu.models.layers import conv1d_apply
    h = jax.nn.relu(conv1d_apply(params["conv_hidden"], attn_cat))
    return jax.nn.sigmoid(conv1d_apply(params["conv_out"], h))


def attention_precompute(params, keys, values):
    """Project keys/values once before an AR inference scan.

    keys/values: (Tk, B, D_in) -> k_proj, vals each (B, Tk, D_att).
    """
    k = linear_apply(params["key"], keys).transpose(1, 0, 2)
    vals = linear_apply(params["value"], values).transpose(1, 0, 2)
    return k, vals


def attention_step(params, query, k_proj, vals, key_mask=None,
                   prior_t=None, temperature=1.0):
    """Single-frame attention for the AR inference scan.

    query: (B, n_query_dim); k_proj/vals: (B, Tk, D); prior_t: (B, Tk)|None.
    Returns context (B, D), attn (B, Tk).
    """
    q = linear_apply(params["query"], query)  # (B, D)
    v_w = params["v"]["w"][:, 0]
    scores = jnp.einsum("bkd,d->bk", jnp.tanh(q[:, None, :] + k_proj), v_w)
    # temperature may be a traced scalar or per-stream (B, 1) vector;
    # cast so it never promotes a bf16 compute path (the scan carry
    # dtype must be stable)
    scores = scores / jnp.asarray(temperature, scores.dtype)
    if key_mask is not None:
        scores = jnp.where(key_mask, scores, MASK_VALUE)
    attn = jax.nn.softmax(scores, axis=-1)
    if prior_t is not None:
        log_post = jnp.log(attn + 1e-20) + jnp.log(prior_t + 1e-20)
        if key_mask is not None:
            log_post = jnp.where(key_mask, log_post, MASK_VALUE)
        attn = jax.nn.softmax(log_post, axis=-1)
    context = jnp.einsum("bk,bkd->bd", attn, vals)
    return context, attn
