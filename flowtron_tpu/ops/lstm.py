"""Mask-aware LSTM as a lax.scan over time — the TPU replacement for cuDNN
packed-sequence LSTMs (reference:flowtron.py:387-414,488-514,654-655,671-695).

Design notes (TPU-first):
- The input projection ``x @ W_ih`` for ALL timesteps is hoisted out of the
  scan into one large MXU matmul of shape (T*B, in) x (in, 4H); only the
  recurrent (B, H) x (H, 4H) matmul stays inside the scan.
- Variable lengths use masking instead of packing: at masked steps the
  (h, c) carry is held and the output is zeroed, which reproduces
  pack_padded_sequence/pad_packed_sequence semantics exactly — including
  reverse-direction runs, where holding the zero carry until the first
  valid step is equivalent to starting the backward LSTM at the true
  sequence end.
- Gate order is (i, f, g, o), matching torch's layout so published
  checkpoints can be imported without re-permuting.

All sequence tensors are time-major: (T, B, F).
"""

import jax
import jax.numpy as jnp
import numpy as np

from flowtron_tpu.utils.weights import resolve_weight, qdot


def lstm_layer_params(key, input_size, hidden_size, dtype=jnp.float32):
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, torch LSTM default."""
    k_wi, k_wh, k_bi, k_bh = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden_size)

    def u(k, shape):
        return jax.random.uniform(k, shape, dtype, minval=-bound, maxval=bound)

    return {
        # stored pre-transposed for right-multiplication: (in, 4H), (H, 4H)
        "w_ih": u(k_wi, (input_size, 4 * hidden_size)),
        "w_hh": u(k_wh, (hidden_size, 4 * hidden_size)),
        "b_ih": u(k_bi, (4 * hidden_size,)),
        "b_hh": u(k_bh, (4 * hidden_size,)),
    }


def lstm_params(key, input_size, hidden_size, num_layers=1,
                bidirectional=False, dtype=jnp.float32):
    """Parameter pytree for a (possibly multi-layer / bidirectional) LSTM."""
    layers = []
    keys = jax.random.split(key, num_layers)
    n_dir = 2 if bidirectional else 1
    for i in range(num_layers):
        in_size = input_size if i == 0 else hidden_size * n_dir
        if bidirectional:
            kf, kb = jax.random.split(keys[i])
            layers.append({
                "fwd": lstm_layer_params(kf, in_size, hidden_size, dtype),
                "bwd": lstm_layer_params(kb, in_size, hidden_size, dtype),
            })
        else:
            layers.append(lstm_layer_params(keys[i], in_size, hidden_size, dtype))
    return {"layers": layers}


def lstm_cell(params, x_proj_t, h, c):
    """One LSTM step given a precomputed input projection.

    x_proj_t: (B, 4H) = x_t @ w_ih + b ;  h, c: (B, H)
    """
    gates = x_proj_t + qdot(h, params["w_hh"], out_dtype=h.dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_single_direction(params, x, mask=None, reverse=False, init=None,
                          remat=False):
    """Run one LSTM direction over a full sequence.

    Args:
      params: one layer's parameter dict.
      x: (T, B, in) inputs.
      mask: (T, B) bool/float validity mask or None.
      reverse: scan from t=T-1 down to 0 (output stays in input order).
      init: optional (h0, c0), each (B, H).
      remat: memory-efficient mode for long sequences / big batches —
        skips the hoisted (T, B, 4H) input-projection buffer (the
        dominant saved activation in backprop) and rematerializes each
        step's gates from the carry during the backward pass.

    Returns:
      outputs (T, B, H) — zeroed at masked steps — and final (h, c).
    """
    T, B = x.shape[0], x.shape[1]
    H = params["w_hh"].shape[0]
    bias = params["b_ih"] + params["b_hh"]

    if remat:
        # project per step inside the (checkpointed) cell: saved state is
        # x itself, not the 4x larger projection
        def project(x_t):
            return qdot(x_t, params["w_ih"], out_dtype=x_t.dtype) + bias
        xs_main = x
    else:
        # Hoisted input projection: one big MXU matmul over all timesteps.
        def project(xp_t):
            return xp_t
        xs_main = jnp.dot(x, params["w_ih"],
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype) + bias

    if init is None:
        h0 = jnp.zeros((B, H), x.dtype)
        c0 = jnp.zeros((B, H), x.dtype)
    else:
        h0, c0 = init

    if mask is None:
        def step(carry, x_t):
            h, c = carry
            h, c = lstm_cell(params, project(x_t), h, c)
            return (h, c), h

        if remat:
            step = jax.checkpoint(step)
        (h, c), ys = jax.lax.scan(step, (h0, c0), xs_main, reverse=reverse)
        return ys, (h, c)

    mask_f = mask.astype(x.dtype)[..., None]  # (T, B, 1)

    def step(carry, inp):
        h, c = carry
        x_t, m_t = inp
        h_new, c_new = lstm_cell(params, project(x_t), h, c)
        h = m_t * h_new + (1.0 - m_t) * h
        c = m_t * c_new + (1.0 - m_t) * c
        return (h, c), h_new * m_t

    if remat:
        step = jax.checkpoint(step)
    (h, c), ys = jax.lax.scan(step, (h0, c0), (xs_main, mask_f),
                              reverse=reverse)
    return ys, (h, c)


def lstm_forward(params, x, mask=None, init=None, remat=False):
    """Multi-layer unidirectional LSTM. Returns (outputs, [(h, c)] per layer)."""
    finals = []
    if init is None:
        init = [None] * len(params["layers"])
    for layer, layer_init in zip(params["layers"], init):
        x, hc = lstm_single_direction(layer, x, mask, init=layer_init,
                                      remat=remat)
        finals.append(hc)
    return x, finals


def bilstm_forward(params, x, mask=None, remat=False):
    """Multi-layer bidirectional LSTM; outputs concat fwd‖bwd per layer."""
    for layer in params["layers"]:
        fwd, _ = lstm_single_direction(layer["fwd"], x, mask, reverse=False,
                                       remat=remat)
        bwd, _ = lstm_single_direction(layer["bwd"], x, mask, reverse=True,
                                       remat=remat)
        x = jnp.concatenate([fwd, bwd], axis=-1)
    return x
