"""Fused WaveNet-layer kernel (Pallas/TPU) for the WaveGlow vocoder.

One kernel launch per WN layer fuses what the XLA path runs as ~6 ops:

    acts = [x[t-d], x[t], x[t+d]] @ W_cat + b + cond      (k=3 dilated conv
    z    = tanh(acts[:, :C]) * sigmoid(acts[:, C:])        as one MXU matmul)
    rs   = z @ W_rs + b_rs
    x'   = x + rs[:, :C]          (residual, fused store)
    skip = rs[:, C:]

Everything is row-independent, so the batch and time axes are flattened
to M = B * T_padded rows and the grid tiles M; activations stay in VMEM
for the whole layer. Replaces the reference's cuDNN dilated convs
(reference vocoder submodule, WaveGlow arXiv:1811.00002 WN stack) with a
TPU-native matmul formulation; see also vocoder/waveglow.py:_wavenet_tc
(the plain-XLA version of the same layout, kept as the oracle).

Padding rows (added so M divides the tile) are re-zeroed on every
residual store via an in-kernel row mask — otherwise bias terms would
grow nonzero values in the pad region that the next layer's time shift
would leak into valid rows.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wn_layer_kernel(xm_ref, x0_ref, xp_ref, cond_ref, w_ref, b_ref,
                     wrs_ref, brs_ref, *out_refs,
                     C, last, T, Tp, tile):
    x_in = jnp.concatenate([xm_ref[:], x0_ref[:], xp_ref[:]], axis=1)
    acts = jnp.dot(x_in, w_ref[:], preferred_element_type=jnp.float32)
    acts = acts + b_ref[:] + cond_ref[:].astype(jnp.float32)
    z = (jnp.tanh(acts[:, :C])
         * jax.nn.sigmoid(acts[:, C:])).astype(x0_ref.dtype)
    rs = jnp.dot(z, wrs_ref[:], preferred_element_type=jnp.float32)
    rs = rs + brs_ref[:]
    if last:
        (skip_ref,) = out_refs
        skip_ref[:] = rs.astype(skip_ref.dtype)
        return
    x_out_ref, skip_ref = out_refs
    # valid-row mask: flattened row r belongs to time step r % Tp of some
    # stream; steps >= T are padding and must stay zero (see module doc)
    rows = (pl.program_id(0) * tile
            + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0))
    valid = (rows % Tp) < T
    x_new = x0_ref[:].astype(jnp.float32) + rs[:, :C]
    x_out_ref[:] = jnp.where(valid, x_new, 0.0).astype(x_out_ref.dtype)
    skip_ref[:] = rs[:, C:].astype(skip_ref.dtype)


def wn_layer_fused(x_m, x0, x_p, cond, w_cat, b, w_rs, b_rs, *,
                   T, Tp, last, tile=512, interpret=False):
    """Run one fused WN layer over (M, C) row-major activations.

    x_m/x0/x_p: (M, C) pre-shifted rows (M = B*Tp, Tp % tile == 0 not
    required — M % tile is). cond: (M, 2C). w_cat: (3C, 2C) concatenated
    conv taps. w_rs: (C, 2C) (or (C, C) when last). Returns
    (x_new, skip); x_new is None when last.
    """
    M, C = x0.shape
    assert M % tile == 0, (M, tile)
    grid = (M // tile,)
    dtype = x0.dtype
    skip_c = w_rs.shape[1] if last else w_rs.shape[1] - C
    b = b.reshape(1, -1)
    b_rs = b_rs.reshape(1, -1)

    row = pl.BlockSpec((tile, C), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    cond_spec = pl.BlockSpec((tile, 2 * C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)

    skip_spec = pl.BlockSpec((tile, skip_c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    skip_shape = jax.ShapeDtypeStruct((M, skip_c), dtype)
    if last:
        out_shape, out_specs = skip_shape, skip_spec
    else:
        out_shape = [jax.ShapeDtypeStruct((M, C), dtype), skip_shape]
        out_specs = [row, skip_spec]

    kernel = functools.partial(_wn_layer_kernel, C=C, last=last,
                               T=T, Tp=Tp, tile=tile)
    flops = 2 * M * (3 * C * 2 * C + C * w_rs.shape[1])
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row, row, row, cond_spec,
                  full(w_cat.shape), full(b.shape),
                  full(w_rs.shape), full(b_rs.shape)],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * M * C * dtype.itemsize,
            transcendentals=2 * M * C),
        interpret=interpret,
    )(x_m, x0, x_p, cond, w_cat, b, w_rs, b_rs)
    if last:
        return None, result
    return result
