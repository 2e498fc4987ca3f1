"""Gaussian-mixture latent prior head (reference:flowtron.py:312-363).

With ``fixed_gaussian``, means are scaled one-hot rows of the identity
chosen at init (a fixed buffer) and log-variance is zero; otherwise means
and log-vars are predicted from the mel-encoder embedding.
"""

import jax
import jax.numpy as jnp

from flowtron_tpu.models.layers import linear_params, linear_apply


def gaussian_mixture_params(key, n_hidden, n_components, n_mel_channels,
                            fixed_gaussian=True, mean_scale=0.0,
                            dtype=jnp.float32):
    k_prob, k_mean, k_var, k_ids = jax.random.split(key, 4)
    p = {
        "prob_layer": linear_params(k_prob, n_hidden, n_components,
                                    dtype=dtype),
    }
    if not fixed_gaussian:
        p["mean_layer"] = linear_params(
            k_mean, n_hidden, n_mel_channels * n_components, dtype=dtype)
        p["log_var_layer"] = linear_params(
            k_var, n_hidden, n_mel_channels * n_components, dtype=dtype)
    else:
        ids = jax.random.choice(k_ids, n_mel_channels, (n_components,),
                                replace=False)
        mean = (jnp.eye(n_mel_channels, dtype=dtype)[ids] * mean_scale)
        p["mean"] = mean.T[None]                       # (1, mel, K)
        p["log_var"] = jnp.zeros((1, n_mel_channels, n_components), dtype)
    return p


def gaussian_mixture_forward(params, outputs, n_components, n_mel_channels):
    """outputs: (B, n_hidden) mel-encoder embedding.

    Returns (mean, log_var, prob): mean/log_var are (1 or B, mel, K),
    prob is (B, K). Fixed-gaussian mode is detected by the presence of the
    'mean' buffer (non-trainable — excluded from the optimizer by
    trainable_mask in train/checkpoints.py).
    """
    bs = outputs.shape[0]
    prob = jax.nn.softmax(linear_apply(params["prob_layer"], outputs), axis=1)
    if "mean" in params:
        mean, log_var = params["mean"], params["log_var"]
    else:
        K, M = n_components, n_mel_channels
        mean = linear_apply(params["mean_layer"], outputs).reshape(bs, M, K)
        log_var = linear_apply(params["log_var_layer"], outputs).reshape(bs, M, K)
    return mean, log_var, prob
