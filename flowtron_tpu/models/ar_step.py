"""Autoregressive affine flow steps.

AR_Step (reference:flowtron.py:645-828): teacher-forced training pushes the
mel through ``mel' = exp(log_s) * mel + b`` where (log_s, b) come from
shifted-mel -> attention LSTM -> text attention -> decoder LSTM -> dense ->
zero-init 1x1 conv. Inference inverts frame by frame:
``out_t = (z_t - b_t) / exp(log_s_t)`` with carried LSTM/attention state.

AR_Back_Step (reference:flowtron.py:595-642) runs the same step over
time-reversed input. The reference's per-sample flip+roll loops become a
single precomputed gather (utils.flip_within_length_indices).

TPU design: training is two masked LSTM scans + one fused attention over the
whole sequence (all large MXU matmuls); inference is one lax.scan whose body
is the fused per-frame cell. Gate early-exit becomes fixed-length scan +
post-hoc first-hit index (n_valid), since TPU scans cannot break.
"""

import jax
import jax.numpy as jnp

from flowtron_tpu.models.layers import (
    linear_params, linear_apply, dense_layer_params, dense_layer_apply,
    qdot,
)
from flowtron_tpu.models.attention import (
    attention_params, attention_forward, attention_precompute, attention_step,
    attention_conditioning_params, attention_conditioning_apply,
)
from flowtron_tpu.ops.lstm import lstm_params, lstm_forward, lstm_cell
from flowtron_tpu.utils.masks import flip_within_length_indices


def ar_step_params(key, n_mel_channels=80, n_speaker_dim=128,
                   n_text_channels=512, n_hidden=1024, n_attn_channels=640,
                   n_lstm_layers=2, add_gate=False, use_cumm_attention=False,
                   dtype=jnp.float32):
    keys = jax.random.split(key, 6)
    p = {
        # zero-init coupling head: every flow starts as the identity
        # (reference:flowtron.py:651-653) — keep this.
        "conv": {
            "w": jnp.zeros((n_hidden, 2 * n_mel_channels), dtype),
            "b": jnp.zeros((2 * n_mel_channels,), dtype),
        },
        "lstm": lstm_params(keys[0], n_hidden + n_attn_channels, n_hidden,
                            num_layers=n_lstm_layers, dtype=dtype),
        "attention_lstm": lstm_params(keys[1], n_mel_channels, n_hidden,
                                      num_layers=1, dtype=dtype),
        "attention_layer": attention_params(
            keys[2], n_hidden, n_speaker_dim, n_text_channels,
            n_attn_channels, dtype=dtype),
        "dense_layer": dense_layer_params(keys[3], n_hidden,
                                          (n_hidden, n_hidden), dtype=dtype),
    }
    if add_gate:
        p["gate_layer"] = linear_params(
            keys[4], n_hidden + n_attn_channels, 1, bias=True,
            w_init_gain="sigmoid", dtype=dtype)
    if use_cumm_attention:
        p["attn_cond_layer"] = attention_conditioning_params(
            keys[5], input_dim=2,
            attention_dim=n_text_channels + n_speaker_dim, dtype=dtype)
    return p


def _cumm_attention_scan(params, attention_hidden, text, key_mask,
                         temperature=1.0):
    """Sequential cumulative-attention pass (training, teacher-forced).

    Mirrors reference:flowtron.py:697-723: per frame, a conv over
    (cumulative attn, previous attn) gates the text keys; key projections
    are recomputed per step. Expressed as a lax.scan over time.
    Note: matching the reference, the attention prior is NOT applied on
    this path (its train call passes no prior).
    """
    Tk, B, Din = text.shape
    text_b = text.transpose(1, 0, 2)                    # (B, Tk, Din)
    vals = linear_apply(params["attention_layer"]["value"],
                        text_b)                         # (B, Tk, Datt)

    def step(carry, q_t):
        attn_cumm, attn_prev = carry
        attn_cat = jnp.stack([attn_cumm, attn_prev], axis=1)  # (B, 2, Tk)
        cond = attention_conditioning_apply(
            params["attn_cond_layer"], attn_cat)              # (B, Din, Tk)
        gated = text_b * cond.transpose(0, 2, 1)
        k_proj = linear_apply(params["attention_layer"]["key"], gated)
        context, attn_w = attention_step(
            params["attention_layer"], q_t, k_proj, vals,
            key_mask=key_mask, temperature=temperature)
        return (attn_cumm + attn_w, attn_w), (context, attn_w)

    init = (jnp.zeros((B, Tk), text.dtype), jnp.zeros((B, Tk), text.dtype))
    _, (contexts, attns) = jax.lax.scan(step, init, attention_hidden)
    attns = attns.transpose(1, 0, 2)                    # (B, T, Tk)
    logprob = jnp.log(attns.astype(jnp.float32) + 1e-8)
    return contexts, attns, logprob


def ar_step_forward(params, mel, text, key_mask, out_mask, attn_prior=None,
                    remat=False):
    """Teacher-forced forward flow.

    Args:
      mel: (T, B, n_mel) time-major mel (current flow input).
      text: (Tk, B, text+speaker) encoder outputs.
      key_mask: (B, Tk) valid text positions.
      out_mask: (T, B) valid mel frames (None for single-sample infer-style).
      attn_prior: (B, T, Tk) or None.

    Returns (mel_out, log_s, gates, attn, attn_logprob).
    """
    n_mel = mel.shape[2]
    dummy = jnp.zeros((1,) + mel.shape[1:], mel.dtype)
    mel0 = jnp.concatenate([dummy, mel[:-1]], axis=0)

    attention_hidden, _ = lstm_forward(params["attention_lstm"], mel0,
                                       out_mask, remat=remat)
    if "attn_cond_layer" in params:
        context, attn, attn_logprob = _cumm_attention_scan(
            params, attention_hidden, text, key_mask)
        # contexts already (T, B, D)
    else:
        context, attn, attn_logprob = attention_forward(
            params["attention_layer"], attention_hidden, text, text,
            key_mask=key_mask, attn_prior=attn_prior)
        # context: (B, D, T) -> (T, B, D)
        context = context.transpose(2, 0, 1)
    decoder_input = jnp.concatenate([attention_hidden, context], axis=-1)

    gates = None
    if "gate_layer" in params:
        gates = linear_apply(params["gate_layer"], decoder_input)  # (T,B,1)

    lstm_hidden, _ = lstm_forward(params["lstm"], decoder_input, out_mask,
                                  remat=remat)
    hidden = dense_layer_apply(params["dense_layer"], lstm_hidden)
    decoder_output = linear_apply(params["conv"], hidden)  # (T, B, 2*mel)

    log_s = decoder_output[:, :, :n_mel]
    b = decoder_output[:, :, n_mel:]
    mel_out = jnp.exp(log_s) * mel + b
    return mel_out, log_s, gates, attn, attn_logprob


def _flip_time(x_tbf, lengths):
    """Flip (T, B, ...) within per-sample lengths (padding stays at end)."""
    T = x_tbf.shape[0]
    idx = flip_within_length_indices(lengths, T)  # (B, T)
    x_btf = jnp.moveaxis(x_tbf, 0, 1)             # (B, T, ...)
    extra = (None,) * (x_btf.ndim - 2)
    gathered = jnp.take_along_axis(
        x_btf, idx[(slice(None), slice(None)) + extra], axis=1)
    return jnp.moveaxis(gathered, 1, 0)


def _flip_prior(prior, lengths):
    """Flip (B, T, Tk) prior along its mel-time axis within lengths."""
    T = prior.shape[1]
    idx = flip_within_length_indices(lengths, T)
    return jnp.take_along_axis(prior, idx[:, :, None], axis=1)


def ar_back_step_forward(params, mel, text, key_mask, out_mask, out_lens,
                         attn_prior=None, remat=False):
    """Backward flow: run ar_step on time-reversed mel.

    Matches reference:flowtron.py:605-627: mel comes back un-flipped;
    log_s / gates / attn stay in the flipped time order (the loss is
    flip-invariant under its mask, and the CTC loss un-flips logprobs
    itself).
    """
    mel_f = _flip_time(mel, out_lens)
    prior_f = _flip_prior(attn_prior, out_lens) if attn_prior is not None \
        else None
    mel_out, log_s, gates, attn, attn_logprob = ar_step_forward(
        params, mel_f, text, key_mask, out_mask, prior_f, remat=remat)
    mel_out = _flip_time(mel_out, out_lens)
    return mel_out, log_s, gates, attn, attn_logprob


def ar_step_infer(params, residual, text, key_mask=None, attn_prior=None,
                  temperature=1.0, gate_threshold=0.5, n_valid=None,
                  attn=None, fused=False, carry=None, return_carry=False):
    """Invert one flow step over sampled latents with a lax.scan.

    Args:
      residual: (N, B, n_mel) latent z (or previous flow's output).
      text: (Tk, B, text+speaker) encoder outputs.
      key_mask: (B, Tk) or None.
      attn_prior: (B, N, Tk) or None.
      n_valid: (B,) frames valid in `residual` (from a previous gated flow);
        None means all N.
      attn: optional externally supplied attention map (B, N, Tk) used
        instead of computed attention (reference:flowtron.py:585-588,797).
      fused: run the whole scan in the VMEM-resident-weights Pallas
        kernel (ops/decoder_pallas.py) — the low-batch latency path
        (~1.7x at B=1). "early" additionally skips all compute for time
        chunks after every stream has finished (gate fired / past the
        previous flow's n_valid) — the reference's frame-loop break
        (reference:flowtron.py:823-825) under static shapes. Falls back
        to lax.scan when the flow is outside the kernel's subset
        (prior / cumulative or external attention / quantized weights).
      carry / return_carry: chunked (streaming) synthesis. `carry` is the
        opaque scan state from a previous call's `return_carry=True`
        (None = fresh start); with return_carry=True the function returns
        (mel, attn, gates_raw (N, B), carry) and skips gate->n_valid
        bookkeeping — the streamer owns utterance termination across
        chunks (infer/streaming.py).

    Returns (mel, attn_weights (B, N, Tk), n_valid_out (B,)).
    """
    from flowtron_tpu.infer.quantize import weight_shape
    N, B, n_mel = residual.shape

    # per-stream (B, 1) temperature vectors broadcast through the scan
    # path; the fused kernel's SMEM temperature slot is scalar-only
    temp_is_scalar = jnp.ndim(temperature) == 0 or \
        all(d == 1 for d in jnp.shape(temperature))
    if fused and temp_is_scalar and not return_carry and carry is None \
            and attn_prior is None and attn is None \
            and "attn_cond_layer" not in params:
        from flowtron_tpu.ops.decoder_pallas import (
            pack_flow_weights, fused_flow_infer)
        w = pack_flow_weights(params)
        if w is not None:
            kp_f, vals_f = attention_precompute(
                params["attention_layer"], text, text)
            km = jnp.ones((B, text.shape[0]), jnp.float32) \
                if key_mask is None else key_mask.astype(jnp.float32)
            mel_f, attn_f, gates_f = fused_flow_infer(
                w, residual, kp_f, vals_f, km, temperature,
                early_exit=(fused == "early"),
                gate_threshold=gate_threshold,
                n_valid_in=n_valid)
            mel_f = mel_f.astype(residual.dtype)
            if "gate_layer" in params:
                hit = gates_f > gate_threshold       # (N, B)
                any_hit = jnp.any(hit, axis=0)
                first = jnp.argmax(hit, axis=0)
                nv_gate = jnp.where(any_hit, first + 1, N)
                nv = nv_gate if n_valid is None else \
                    jnp.minimum(n_valid, nv_gate)
            else:
                nv = jnp.full((B,), N, jnp.int32) if n_valid is None \
                    else n_valid
            return mel_f, attn_f.transpose(1, 0, 2).astype(residual.dtype), \
                nv
    H = weight_shape(params["lstm"]["layers"][0]["w_hh"])[0]
    n_layers = len(params["lstm"]["layers"])

    k_proj, vals = attention_precompute(params["attention_layer"], text, text)
    has_gate = "gate_layer" in params
    has_cumm = "attn_cond_layer" in params
    Tk = text.shape[0]
    text_b = text.transpose(1, 0, 2)

    att_layer_p = params["attention_lstm"]["layers"][0]
    att_bias = att_layer_p["b_ih"] + att_layer_p["b_hh"]

    def cell(carry, xs):
        (h_att, c_att, hs, cs, prev_out, attn_cumm, attn_prev) = carry
        z_t, prior_t, attn_ext_t = xs

        # attention LSTM cell on previous output frame
        xp = qdot(prev_out, att_layer_p["w_ih"],
                  out_dtype=prev_out.dtype) + att_bias
        h_att, c_att = lstm_cell(att_layer_p, xp, h_att, c_att)

        if has_cumm:
            attn_cat = jnp.stack([attn_cumm, attn_prev], axis=1)
            cond = attention_conditioning_apply(
                params["attn_cond_layer"], attn_cat)
            gated = text_b * cond.transpose(0, 2, 1)
            k_proj_t = linear_apply(params["attention_layer"]["key"], gated)
        else:
            k_proj_t = k_proj

        if attn_ext_t is not None:
            # externally supplied attention: context = attn @ values
            attn_w = attn_ext_t
            context = jnp.einsum("bk,bkd->bd", attn_w, vals)
        else:
            context, attn_w = attention_step(
                params["attention_layer"], h_att, k_proj_t, vals,
                key_mask=key_mask, prior_t=prior_t, temperature=temperature)
        attn_cumm = attn_cumm + attn_w
        decoder_input = jnp.concatenate([h_att, context], axis=-1)

        gate = jnp.zeros((B,), residual.dtype)
        if has_gate:
            gate = jax.nn.sigmoid(
                linear_apply(params["gate_layer"], decoder_input))[:, 0]

        x = decoder_input
        new_hs, new_cs = [], []
        for li, layer_p in enumerate(params["lstm"]["layers"]):
            xp_l = qdot(x, layer_p["w_ih"], out_dtype=x.dtype) \
                + layer_p["b_ih"] + layer_p["b_hh"]
            h_l, c_l = lstm_cell(layer_p, xp_l, hs[li], cs[li])
            new_hs.append(h_l)
            new_cs.append(c_l)
            x = h_l

        hidden = dense_layer_apply(params["dense_layer"], x)
        decoder_output = linear_apply(params["conv"], hidden)
        log_s = decoder_output[:, :n_mel]
        b = decoder_output[:, n_mel:]
        out = (z_t - b) * jnp.exp(-log_s)

        new_carry = (h_att, c_att, tuple(new_hs), tuple(new_cs), out,
                     attn_cumm, attn_w)
        return new_carry, (out, attn_w, gate)

    init = carry if carry is not None else (
        jnp.zeros((B, H), residual.dtype),
        jnp.zeros((B, H), residual.dtype),
        tuple(jnp.zeros((B, H), residual.dtype) for _ in range(n_layers)),
        tuple(jnp.zeros((B, H), residual.dtype) for _ in range(n_layers)),
        jnp.zeros((B, n_mel), residual.dtype),
        jnp.zeros((B, Tk), residual.dtype),
        jnp.zeros((B, Tk), residual.dtype),
    )
    prior_xs = attn_prior.transpose(1, 0, 2) if attn_prior is not None \
        else None
    attn_xs = attn.transpose(1, 0, 2) if attn is not None else None
    xs = (residual, prior_xs, attn_xs)

    carry_out, (mel, attn_w, gates) = jax.lax.scan(cell, init, xs)

    if return_carry:
        return mel, attn_w.transpose(1, 0, 2), gates, carry_out

    if has_gate:
        # first frame whose gate fires ends the utterance (inclusive),
        # mirroring the reference's break-after-append
        # (reference:flowtron.py:823-825)
        hit = gates > gate_threshold          # (N, B)
        any_hit = jnp.any(hit, axis=0)
        first = jnp.argmax(hit, axis=0)
        n_valid_gate = jnp.where(any_hit, first + 1, N)
        n_valid = n_valid_gate if n_valid is None else \
            jnp.minimum(n_valid, n_valid_gate)
    elif n_valid is None:
        n_valid = jnp.full((B,), N, jnp.int32)

    return mel, attn_w.transpose(1, 0, 2), n_valid


def ar_back_step_infer(params, residual, text, key_mask=None,
                       attn_prior=None, temperature=1.0, gate_threshold=0.5,
                       n_valid=None, attn=None, fused=False):
    """Backward flow inference: flip in, invert, flip back
    (reference:flowtron.py:629-642)."""
    N, B, _ = residual.shape
    if n_valid is None:
        n_valid = jnp.full((B,), N, jnp.int32)
    residual_f = _flip_time(residual, n_valid)
    prior_f = _flip_prior(attn_prior, n_valid) if attn_prior is not None \
        else None
    mel, attn_w, n_valid_out = ar_step_infer(
        params, residual_f, text, key_mask, prior_f, temperature,
        gate_threshold, n_valid=n_valid, attn=attn, fused=fused)
    mel = _flip_time(mel, n_valid_out)
    return mel, attn_w, n_valid_out
