"""Flowtron top-level model: parameter init, training forward, inference.

Mirrors reference:flowtron.py:831-961 semantics: speaker + text embeddings,
conv/BiLSTM text encoder, n_flows alternating forward (even index) and
backward (odd index) AR steps, gate layer only on the last flow, inference
running the flows in reverse with per-flow temperature/gate injection.

Functional design: ``flowtron_init`` builds a parameter pytree;
``flowtron_forward`` / ``flowtron_infer`` are pure functions suitable for
jit/pjit and differentiation.
"""

import jax
import jax.numpy as jnp

from flowtron_tpu.models.layers import embedding_params, embedding_apply
from flowtron_tpu.models.encoder import (
    encoder_params, encoder_forward, encoder_infer,
    mel_encoder_params, mel_encoder_forward,
)
from flowtron_tpu.models.gaussian_mixture import (
    gaussian_mixture_params, gaussian_mixture_forward,
)
from flowtron_tpu.models.ar_step import (
    ar_step_params, ar_step_forward, ar_back_step_forward,
    ar_step_infer, ar_back_step_infer,
)
from flowtron_tpu.utils.masks import sequence_mask


def flowtron_init(key, n_speakers=1, n_speaker_dim=128, n_text=185,
                  n_text_dim=512, n_flows=2, n_mel_channels=80,
                  n_hidden=1024, n_attn_channels=640, n_lstm_layers=2,
                  use_gate_layer=True, mel_encoder_n_hidden=512,
                  n_components=0, fixed_gaussian=True, mean_scale=0.0,
                  dummy_speaker_embedding=False, use_cumm_attention=False,
                  dtype=jnp.float32):
    """Build the Flowtron parameter pytree + static config."""
    keys = jax.random.split(key, n_flows + 4)
    params = {
        "speaker_embedding": embedding_params(keys[0], n_speakers,
                                              n_speaker_dim, dtype),
        "embedding": embedding_params(keys[1], n_text, n_text_dim, dtype),
        "encoder": encoder_params(keys[2], encoder_embedding_dim=n_text_dim,
                                  dtype=dtype),
        "flows": [],
    }
    if n_components > 1:
        k_me, k_gm = jax.random.split(keys[3])
        params["mel_encoder"] = mel_encoder_params(
            k_me, mel_encoder_n_hidden, n_mel_channels=n_mel_channels,
            dtype=dtype)
        params["gaussian_mixture"] = gaussian_mixture_params(
            k_gm, mel_encoder_n_hidden, n_components, n_mel_channels,
            fixed_gaussian, mean_scale, dtype)

    for i in range(n_flows):
        add_gate = (i == n_flows - 1) and use_gate_layer
        params["flows"].append(ar_step_params(
            keys[4 + i], n_mel_channels, n_speaker_dim, n_text_dim,
            n_hidden, n_attn_channels, n_lstm_layers, add_gate,
            use_cumm_attention, dtype))

    config = {
        "n_flows": n_flows,
        "n_mel_channels": n_mel_channels,
        "n_components": n_components,
        "dummy_speaker_embedding": dummy_speaker_embedding,
        "use_gate_layer": use_gate_layer,
    }
    return params, config


def _encode_text(params, config, speaker_ids, text, in_lens_mask=None,
                 train=False, dropout_key=None):
    """Shared embed + encode + speaker-concat. Returns (Tk, B, text+spk)."""
    if config["dummy_speaker_embedding"]:
        speaker_ids = speaker_ids * 0
    speaker_vecs = embedding_apply(params["speaker_embedding"], speaker_ids)
    text_emb = embedding_apply(params["embedding"], text)  # (B, Tk, C)
    text_emb = text_emb.transpose(0, 2, 1)                 # (B, C, Tk)
    if in_lens_mask is not None:
        enc = encoder_forward(params["encoder"], text_emb, in_lens_mask,
                              train=train, dropout_key=dropout_key)
    else:
        enc = encoder_infer(params["encoder"], text_emb)
    Tk = enc.shape[0]
    spk = jnp.broadcast_to(speaker_vecs[None, :, :],
                           (Tk,) + speaker_vecs.shape)
    return jnp.concatenate([enc, spk], axis=2)


def flowtron_forward(params, config, mel, speaker_ids, text, in_lens,
                     out_lens, attn_prior=None, train=False,
                     dropout_key=None, compute_dtype=None,
                     remat_scans=False):
    """Training-direction pass: mel -> z.

    Args:
      mel: (B, n_mel, T); speaker_ids: (B,); text: (B, Tk) int ids.
      in_lens / out_lens: (B,) true lengths.
      attn_prior: (B, T, Tk) or None.
      compute_dtype: e.g. jnp.bfloat16 — mixed-precision policy replacing
        the reference's AMP (reference:train.py:254,292): params and
        activations are cast for compute, master params stay fp32, the
        loss consumes fp32 (flowtron_loss casts its inputs).

    Returns (z, log_s_list, gate_pred, attn_list, attn_logprob_list,
    mean, log_var, prob) — same tuple contract as the reference
    (reference:flowtron.py:870-899).
    """
    if compute_dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, params)
        mel = mel.astype(compute_dtype)
        if attn_prior is not None:
            attn_prior = attn_prior.astype(compute_dtype)
    B, _, T = mel.shape
    Tk = text.shape[1]
    key_mask = sequence_mask(in_lens, Tk)        # (B, Tk)
    out_mask_tb = sequence_mask(out_lens, T).T   # (T, B)

    dk_enc = dk_mel = None
    if dropout_key is not None:
        dk_enc, dk_mel = jax.random.split(dropout_key)

    encoder_outputs = _encode_text(params, config, speaker_ids, text,
                                   key_mask, train=train, dropout_key=dk_enc)

    mean = log_var = prob = None
    if config["n_components"] > 1:
        mel_embedding = mel_encoder_forward(
            params["mel_encoder"], mel, sequence_mask(out_lens, T),
            train=train, dropout_key=dk_mel)
        mean, log_var, prob = gaussian_mixture_forward(
            params["gaussian_mixture"], mel_embedding,
            config["n_components"], config["n_mel_channels"])

    z = mel.transpose(2, 0, 1)  # (T, B, n_mel)
    log_s_list, attn_list, attn_logprob_list = [], [], []
    gate_pred = None
    for i, flow_params in enumerate(params["flows"]):
        if i % 2 == 0:
            z, log_s, gate, attn, attn_logprob = ar_step_forward(
                flow_params, z, encoder_outputs, key_mask, out_mask_tb,
                attn_prior, remat=remat_scans)
        else:
            z, log_s, gate, attn, attn_logprob = ar_back_step_forward(
                flow_params, z, encoder_outputs, key_mask, out_mask_tb,
                out_lens, attn_prior, remat=remat_scans)
        if gate is not None:
            gate_pred = gate
        log_s_list.append(log_s)
        attn_list.append(attn)
        attn_logprob_list.append(attn_logprob)

    return (z, log_s_list, gate_pred, attn_list, attn_logprob_list,
            mean, log_var, prob)


def flowtron_infer(params, config, residual, speaker_ids, text,
                   temperature=1.0, gate_threshold=0.5, attn_prior=None,
                   in_lens=None, attns=None, fused=False):
    """Inference: invert the flows over sampled latents.

    Args:
      residual: (B, n_mel, N) sampled z (sigma applied by caller).
      speaker_ids: (B,); text: (B, Tk).
      in_lens: optional (B,) text lengths for batched inference with
        padding; None (the reference's single-sample case) means all valid.
      fused: route each flow's scan through the VMEM-resident-weights
        Pallas kernel (low-batch latency serving path; per-flow
        fallback to lax.scan where unsupported). "early" additionally
        stops computing once every stream's gate has fired (the
        reference's frame-loop break); frames beyond n_valid are then
        zeros instead of the scan path's (equally meaningless)
        continuations.

    Returns (mel (B, n_mel, N), attn_list, n_valid (B,)).
    """
    Tk = text.shape[1]
    key_mask = None
    if in_lens is not None:
        key_mask = sequence_mask(in_lens, Tk)

    encoder_outputs = _encode_text(params, config, speaker_ids, text,
                                   key_mask)

    z = residual.transpose(2, 0, 1)  # (N, B, n_mel)
    n_valid = None
    n_flows = config["n_flows"]
    out_attns = []
    for rev_i, flow_params in enumerate(reversed(params["flows"])):
        i = n_flows - 1 - rev_i
        # reference indexes reversed(attns)[rev_i] (reference:flowtron.py:925)
        attn_ext = None
        if attns is not None:
            attn_ext = attns[len(attns) - 1 - rev_i]
        if i % 2 == 0:
            z, attn_w, n_valid = ar_step_infer(
                flow_params, z, encoder_outputs, key_mask, attn_prior,
                temperature, gate_threshold, n_valid=n_valid, attn=attn_ext,
                fused=fused)
        else:
            z, attn_w, n_valid = ar_back_step_infer(
                flow_params, z, encoder_outputs, key_mask, attn_prior,
                temperature, gate_threshold, n_valid=n_valid, attn=attn_ext,
                fused=fused)
        out_attns.append(attn_w)

    return z.transpose(1, 2, 0), out_attns, n_valid


def flowtron_test_invertibility(params, config, residual, speaker_ids, text,
                                temperature=1.0):
    """infer -> forward round-trip error; should be ~1e-5 or less
    (the reference's own oracle, reference:flowtron.py:932-954, with its
    unpacking bug fixed).

    Runs at highest matmul precision: the TPU default (bf16x3 passes)
    inflates the round-trip error to ~2e-4 at flagship dims; full fp32
    gives ~2e-6 (measured on v5e).
    """
    B, n_mel, N = residual.shape
    with jax.default_matmul_precision("highest"):
        mel, _, n_valid = flowtron_infer(
            params, config, residual, speaker_ids, text,
            temperature=temperature, gate_threshold=1e6)  # no early gate
        in_lens = jnp.full((B,), text.shape[1], jnp.int32)
        out_lens = jnp.full((B,), N, jnp.int32)
        z_recon, _, _, _, _, _, _, _ = flowtron_forward(
            params, config, mel, speaker_ids, text, in_lens, out_lens)

    residual_tb = residual.transpose(2, 0, 1)
    # (the reference flips both tensors for even n_flows before comparing —
    # a no-op for equal-length sequences, so it is omitted here)
    return jnp.mean(jnp.abs(z_recon - residual_tb))
