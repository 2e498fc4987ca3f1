"""Basic layers as parameter pytrees + pure functions.

Initializers mirror the reference's LinearNorm/ConvNorm xavier-uniform with
activation-dependent gains (reference:flowtron.py:278-309).
"""

import jax
import jax.numpy as jnp
import numpy as np

from flowtron_tpu.utils.weights import (  # noqa: F401 (re-export)
    resolve_weight, qdot,
)

_GAINS = {
    "linear": 1.0,
    "tanh": 5.0 / 3.0,
    "relu": float(np.sqrt(2.0)),
    "sigmoid": 1.0,
}


def xavier_uniform(key, shape, gain=1.0, dtype=jnp.float32, fan=None):
    """Xavier/Glorot uniform. ``shape`` is (out, in) or (out, in, k)."""
    if fan is None:
        receptive = int(np.prod(shape[2:])) if len(shape) > 2 else 1
        fan_out, fan_in = shape[0] * receptive, shape[1] * receptive
    else:
        fan_out, fan_in = fan
    bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_params(key, in_dim, out_dim, bias=True, w_init_gain="linear",
                  dtype=jnp.float32):
    # weight stored (in, out) for right-multiplication; init computed with
    # torch's (out, in) fan convention (identical for xavier).
    w = xavier_uniform(key, (out_dim, in_dim), _GAINS[w_init_gain], dtype).T
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def linear_apply(p, x):
    # fp32 MXU accumulation, outputs stored in the compute dtype
    y = qdot(x, p["w"], out_dtype=x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def conv1d_params(key, in_channels, out_channels, kernel_size=1, bias=True,
                  w_init_gain="linear", dtype=jnp.float32):
    """'Same'-padded 1-D conv; weight (out, in, k), torch layout."""
    w = xavier_uniform(key, (out_channels, in_channels, kernel_size),
                       _GAINS[w_init_gain], dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_channels,), dtype)
    return p


def conv1d_apply(p, x, dilation=1):
    """x: (B, C_in, T) -> (B, C_out, T) with same padding (odd kernels)."""
    k = p["w"].shape[-1]
    pad = dilation * (k - 1) // 2
    # output dtype tracks the compute dtype (the MXU accumulates bf16
    # matmuls in fp32 in hardware regardless); a mixed preferred type
    # breaks the conv VJP under bf16.
    y = jax.lax.conv_general_dilated(
        x, p["w"],
        window_strides=(1,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


def dense_layer_params(key, in_dim=1024, sizes=(1024, 1024), dtype=jnp.float32):
    """Stack of Linear+tanh (reference:flowtron.py:453-464)."""
    keys = jax.random.split(key, len(sizes))
    in_sizes = (in_dim,) + tuple(sizes[:-1])
    return {
        "layers": [
            linear_params(k, i, o, bias=True, dtype=dtype)
            for k, i, o in zip(keys, in_sizes, sizes)
        ]
    }


def dense_layer_apply(p, x):
    for lp in p["layers"]:
        x = jnp.tanh(linear_apply(lp, x))
    return x


def embedding_params(key, num, dim, dtype=jnp.float32):
    # torch Embedding default: N(0, 1)
    return {"table": jax.random.normal(key, (num, dim), dtype)}


def embedding_apply(p, ids):
    return jnp.take(p["table"], ids, axis=0)


def masked_instance_norm(x, mask, eps=1e-5, weight=None, bias=None):
    """Instance norm over valid timesteps only.

    x: (B, C, T); mask: (B, 1, T) — statistics use only mask==True steps
    (reference:flowtron.py:53-92, always affine with running stats off).
    """
    mask_f = mask.astype(x.dtype)
    lengths = jnp.sum(mask_f, axis=-1)  # (B, 1)
    mean = jnp.sum(x * mask_f, axis=-1) / lengths  # (B, C)
    var = jnp.sum(jnp.square((x - mean[..., None]) * mask_f), axis=-1) / lengths
    out = (x - mean[..., None]) / jnp.sqrt(var[..., None] + eps)
    if weight is not None:
        out = out * weight[None, :, None] + bias[None, :, None]
    return out


def instance_norm(x, eps=1e-5, weight=None, bias=None):
    """Plain instance norm over time (used on the unmasked infer path)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    out = (x - mean) / jnp.sqrt(var + eps)
    if weight is not None:
        out = out * weight[None, :, None] + bias[None, :, None]
    return out
