"""Flowtron training losses: masked NLL, gate BCE, CTC alignment loss.

Semantics match reference:flowtron.py:155-275 exactly:
- NLL = sum(z^2 * mask) / (2 sigma^2) - sum_i sum(log_s_i * mask),
  normalized by n_valid_frames * n_mel_dims; Gaussian-mixture variant via
  the log-sum-exp trick.
- gate BCE-with-logits, masked and normalized by n_valid_frames.
- CTC over the attention log-posterior with a prepended blank column,
  target sequence 1..key_len, per-sample loss divided by key_len (torch
  CTCLoss 'mean' reduction), averaged over batch and flows. Backward-flow
  logprobs are un-flipped with the same within-length gather the flows use.

TPU-native difference: the CTC is optax's vectorized log-space DP (one
program for the whole batch) instead of the reference's per-sample Python
loop (reference:flowtron.py:170-180).
"""

import jax.numpy as jnp
import optax

from flowtron_tpu.utils.masks import sequence_mask, flip_within_length_indices


def _bce_with_logits(logits, targets):
    """Elementwise binary cross-entropy with logits (torch-compatible)."""
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def attention_ctc_loss(attn_logprob, in_lens, out_lens, blank_logprob=-1.0):
    """CTC alignment loss for one flow.

    attn_logprob: (B, T_mel, T_text) pre-softmax attention log-posterior.
    Returns scalar: mean over batch of per-sample CTC NLL / key_len.
    """
    B, T, Tk = attn_logprob.shape
    # prepend the blank column at class index 0
    logits = jnp.pad(attn_logprob, ((0, 0), (0, 0), (1, 0)),
                     constant_values=blank_logprob)

    # classes beyond key_len+1 must not participate in the softmax
    # (the reference slices [:key_len+1]; masking to -1e9 is equivalent)
    class_ids = jnp.arange(Tk + 1)[None, None, :]
    class_valid = class_ids <= in_lens[:, None, None]
    logits = jnp.where(class_valid, logits, -1e9)

    logit_paddings = 1.0 - sequence_mask(out_lens, T).astype(jnp.float32)
    labels = jnp.broadcast_to(jnp.arange(1, Tk + 1)[None, :], (B, Tk))
    label_paddings = 1.0 - sequence_mask(in_lens, Tk).astype(jnp.float32)
    labels = (labels * (1 - label_paddings)).astype(jnp.int32)

    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings,
                             blank_id=0)
    # zero_infinity=True semantics: impossible alignments contribute 0
    per_seq = jnp.where(per_seq < 1e5, per_seq, 0.0)
    per_seq = per_seq / in_lens.astype(per_seq.dtype)
    return jnp.mean(per_seq)


def flowtron_loss(model_output, gate_target, in_lens, out_lens, sigma=1.0,
                  gm_loss=False, gate_loss=True, use_ctc_loss=False,
                  blank_logprob=-1.0):
    """Compute (nll, gate, ctc) losses from flowtron_forward output.

    gate_target: (B, T) 1.0 from the last real frame onward.
    """
    (z, log_s_list, gate_pred, attn_list, attn_logprob_list,
     mean, log_var, prob) = model_output

    # losses always accumulate in fp32 (bf16 compute policy upstream)
    f32 = lambda x: None if x is None else x.astype(jnp.float32)  # noqa: E731
    z = f32(z)
    log_s_list = [f32(ls) for ls in log_s_list]
    gate_pred = f32(gate_pred)
    mean, log_var, prob = f32(mean), f32(log_var), f32(prob)

    T, B, n_mel = z.shape
    mask = sequence_mask(out_lens, T).T[..., None].astype(z.dtype)  # (T,B,1)
    n_elements = jnp.sum(mask)

    log_s_total = 0.0
    for log_s in log_s_list:
        log_s_total = log_s_total + jnp.sum(log_s * mask)

    if gm_loss:
        # (T, B, M, 1) vs mean/log_var (1, 1|B, M, K), prob (1, B, 1, K)
        zk = z[..., None]
        mean_b = mean[None]
        log_var_b = log_var[None]
        prob_b = prob[None, :, None, :]
        _z = -jnp.square(zk - mean_b) / (2.0 * jnp.exp(log_var_b))
        _zmax = jnp.max(_z, axis=3, keepdims=True)
        _z = prob_b * jnp.exp(_z - _zmax) / jnp.sqrt(jnp.exp(log_var_b))
        _z = _zmax + jnp.log(jnp.sum(_z, axis=3, keepdims=True))
        nll = -jnp.sum(mask[..., None] * _z)
        loss_nll = nll - log_s_total
    else:
        zm = z * mask
        loss_nll = jnp.sum(zm * zm) / (2.0 * sigma * sigma) - log_s_total
    loss_nll = loss_nll / (n_elements * n_mel)

    loss_gate = jnp.zeros((), z.dtype)
    if gate_loss and gate_pred is not None:
        gp = (gate_pred * mask)[..., 0].T  # (B, T)
        bce = _bce_with_logits(gp, gate_target)
        loss_gate = jnp.sum(bce * mask[..., 0].T) / n_elements

    loss_ctc = jnp.zeros((), z.dtype)
    if use_ctc_loss:
        for i, attn_logprob in enumerate(attn_logprob_list):
            if i % 2 != 0 and attn_logprob is not None:
                # un-flip backward-flow logprobs to forward time order
                idx = flip_within_length_indices(out_lens,
                                                 attn_logprob.shape[1])
                attn_logprob = jnp.take_along_axis(attn_logprob,
                                                   idx[:, :, None], axis=1)
            loss_ctc = loss_ctc + attention_ctc_loss(
                attn_logprob, in_lens, out_lens, blank_logprob)
        loss_ctc = loss_ctc / float(len(attn_logprob_list))

    return loss_nll, loss_gate, loss_ctc
