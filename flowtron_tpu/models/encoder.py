"""Text encoder and mel (prior) encoder.

Text encoder (reference:flowtron.py:467-525): 3 x (conv k=5 + masked
instance norm + relu + dropout 0.5, padding zeroed before each conv) then a
single-layer BiLSTM. Mel encoder (reference:flowtron.py:366-450): same shape
with 2 convs k=3 over 80-ch mels and a mean-pool over (padded) time — the
reference divides by max_len, not true length; that quirk is kept for
checkpoint parity.
"""

import jax
import jax.numpy as jnp

from flowtron_tpu.models.layers import (
    conv1d_params, conv1d_apply, masked_instance_norm, instance_norm,
)
from flowtron_tpu.ops.lstm import lstm_params, bilstm_forward


def _norm_params(dim):
    return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def encoder_params(key, encoder_n_convolutions=3, encoder_embedding_dim=512,
                   encoder_kernel_size=5, dtype=jnp.float32):
    keys = jax.random.split(key, encoder_n_convolutions + 1)
    convs = []
    for i in range(encoder_n_convolutions):
        convs.append({
            "conv": conv1d_params(keys[i], encoder_embedding_dim,
                                  encoder_embedding_dim,
                                  encoder_kernel_size,
                                  w_init_gain="relu", dtype=dtype),
            "norm": _norm_params(encoder_embedding_dim),
        })
    return {
        "convolutions": convs,
        "lstm": lstm_params(keys[-1], encoder_embedding_dim,
                            encoder_embedding_dim // 2, num_layers=1,
                            bidirectional=True, dtype=dtype),
    }


def _conv_stack(convs, x, mask_b1t, train, dropout_key, kernel_dilation=1):
    """Shared conv+norm+relu+dropout stack. x: (B, C, T)."""
    for i, layer in enumerate(convs):
        if mask_b1t is not None:
            x = jnp.where(mask_b1t, x, 0.0)
        y = conv1d_apply(layer["conv"], x, dilation=kernel_dilation)
        if mask_b1t is not None:
            y = masked_instance_norm(y, mask_b1t,
                                     weight=layer["norm"]["weight"],
                                     bias=layer["norm"]["bias"])
        else:
            y = instance_norm(y, weight=layer["norm"]["weight"],
                              bias=layer["norm"]["bias"])
        y = jax.nn.relu(y)
        if train and dropout_key is not None:
            dk = jax.random.fold_in(dropout_key, i)
            keep = jax.random.bernoulli(dk, 0.5, y.shape)
            y = jnp.where(keep, y / 0.5, 0.0)
        x = y
    return x


def encoder_forward(params, x, in_lens_mask, train=False, dropout_key=None):
    """x: (B, C, T) text embeddings; in_lens_mask: (B, T) bool.

    Returns (T, B, C) time-major encoder outputs (zeroed at padding).
    """
    mask_b1t = in_lens_mask[:, None, :]
    x = _conv_stack(params["convolutions"], x, mask_b1t, train, dropout_key)
    x = x.transpose(2, 0, 1)  # (T, B, C)
    return bilstm_forward(params["lstm"], x, in_lens_mask.T)


def encoder_infer(params, x):
    """Unmasked inference path (reference:flowtron.py:516-525)."""
    x = _conv_stack(params["convolutions"], x, None, False, None)
    x = x.transpose(2, 0, 1)
    return bilstm_forward(params["lstm"], x, None)


def mel_encoder_params(key, n_hidden=512, encoder_kernel_size=3,
                       encoder_n_convolutions=2, n_mel_channels=80,
                       dtype=jnp.float32):
    keys = jax.random.split(key, encoder_n_convolutions + 1)
    convs = []
    for i in range(encoder_n_convolutions):
        convs.append({
            "conv": conv1d_params(
                keys[i], n_mel_channels if i == 0 else n_hidden, n_hidden,
                encoder_kernel_size, w_init_gain="relu", dtype=dtype),
            "norm": _norm_params(n_hidden),
        })
    return {
        "convolutions": convs,
        "lstm": lstm_params(keys[-1], n_hidden, n_hidden // 2, num_layers=1,
                            bidirectional=True, dtype=dtype),
    }


def mel_encoder_forward(params, mel, out_lens_mask, train=False,
                        dropout_key=None):
    """mel: (B, 80, T); returns (B, n_hidden) pooled embedding."""
    mask_b1t = out_lens_mask[:, None, :]
    x = _conv_stack(params["convolutions"], mel, mask_b1t, train, dropout_key)
    x = x.transpose(2, 0, 1)
    x = bilstm_forward(params["lstm"], x, out_lens_mask.T)
    # reference quirk: mean over padded max_len, not true lengths
    return jnp.mean(x, axis=0)
