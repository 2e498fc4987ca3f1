"""Pallas weight-streaming quantized matmul for the AR inference scan.

The AR decoder scan is HBM-bandwidth-bound on per-step weight reads
(ROADMAP.md). With int8 weights the XLA path (dequantize behind an
optimization barrier, then dot) materializes a full dequantized copy of
every weight every step — streaming int8 bytes but also writing+reading
a bf16/f32 copy, which erases most of the win. This kernel instead
computes

    out = (x @ q.astype(x.dtype)) * s

with the int8 -> compute-dtype convert fused inside the kernel on VMEM
tiles and the per-output-channel scale folded into the (tiny) output:
HBM traffic per step is exactly the int8 bytes, and Mosaic's grid
pipelining double-buffers each weight tile's DMA against the previous
tile's MXU work (ROADMAP lever (c): overlap weight streaming with
compute).

Replaces the cuBLAS GEMMs of the reference's decoder hot loop
(reference:flowtron.py:775-828) for the int8 serving mode.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref):
    acc = jnp.dot(x_ref[:], q_ref[:].astype(x_ref.dtype),
                  preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


def _qmm_w8a8_kernel(x_ref, q_ref, s_ref, o_ref):
    # dynamic per-row activation quantization -> int8 x int8 on the MXU
    # (2x the bf16 MXU rate; the decoder scan at B>=64 is compute-bound)
    x = x_ref[:].astype(jnp.float32)
    sx = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
    sx = jnp.where(sx == 0.0, 1.0, sx)
    xq = jnp.clip(jnp.round(x / sx), -127.0, 127.0).astype(jnp.int8)
    acc = jnp.dot(xq, q_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx * s_ref[:]).astype(o_ref.dtype)


def _round_up(v, m):
    return -(-v // m) * m


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret", "a8"))
def quantized_matmul(x, q, s, out_dtype=None, interpret=False, a8=False):
    """x: (M, K) float; q: (K, N) int8; s: (N,) f32 per-channel scales.

    Returns (M, N) in out_dtype (default x.dtype) with fp32 MXU
    accumulation — numerically identical to
    ``dot(x, q.astype(x.dtype) * s)`` up to fp32-accumulation order.

    a8=True additionally quantizes activations per row on the fly and
    runs the int8 x int8 MXU path (W8A8): ~2x the bf16 MXU rate, with a
    bounded extra quantization error measured in tests/test_quantize.py.
    """
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    Kq, N = q.shape
    assert K == Kq, (x.shape, q.shape)

    # row/lane alignment: pad M to the sublane quantum, K to lanes
    m_align = 16 if x.dtype == jnp.bfloat16 else 8
    Mp, Kp = _round_up(M, m_align), _round_up(K, 128)
    if Mp != M or Kp != K:
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    if Kp != K:
        q = jnp.pad(q, ((0, Kp - K), (0, 0)))

    # N tiling: whole-N when small, else the largest 128-multiple
    # divisor <= 512 (pipelined tiles)
    if N <= 1024 and N % 128 == 0:
        tn = N
    else:
        tn = next((t for t in (512, 384, 256, 128) if N % t == 0), None)
        if tn is None:
            # non-128-multiple out dim (possible on non-flagship model
            # dims): a bare StopIteration would surface as an opaque
            # trace error — name the constraint instead
            raise ValueError(
                f"quantized_matmul needs the output dim to be a multiple "
                f"of 128 (got {N}); use the XLA dequant path (mode 'w8') "
                f"for this model configuration")
    grid = (N // tn,)

    out = pl.pallas_call(
        _qmm_w8a8_kernel if a8 else _qmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, tn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * N,
            bytes_accessed=Kp * N + Mp * Kp * x.dtype.itemsize
            + Mp * N * jnp.dtype(out_dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, q, s.reshape(1, N))
    return out[:M] if Mp != M else out
