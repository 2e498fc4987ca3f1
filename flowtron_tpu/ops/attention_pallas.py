"""Pallas TPU kernel for additive-attention scores.

score[b, q, t] = sum_d v[d] * tanh(Q[b, q, d] + K[b, t, d]) / temperature

The reference materializes the full (B, Tq, Tk, D) tensor in HBM
(reference:flowtron.py:572). The XLA fallback here fuses the reduce, but
still walks HBM once per (q, t, d) triple; this kernel tiles (Tq, Tk) so
each query/key block is loaded into VMEM once and the (TQ, TK, D)
intermediate never leaves the chip's vector memory.

Tile choice: TQ=16, TK=128 keeps the fp32 intermediate at
16*128*D bytes*4 (5.2 MB at D=640) under the ~16 MB VMEM budget, with the
output block (16, 128) exactly one (sublane, lane) tile.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 16
TK = 128


def _scores_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]            # (TQ, D)
    k = k_ref[0]            # (TK, D)
    v = v_ref[:]            # (1, D)
    t = jnp.tanh(q[:, None, :] + k[None, :, :])          # (TQ, TK, D) VMEM
    o_ref[0] = jnp.sum(t * v[None, :, :], axis=-1)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


@partial(jax.jit, static_argnames=("interpret",))
def attention_scores_pallas(q, k, v_w, temperature=1.0, interpret=False):
    """q: (B, Tq, D), k: (B, Tk, D), v_w: (D,) -> (B, Tq, Tk) scores."""
    B, Tq, D = q.shape
    Tk = k.shape[1]
    qp = _pad_to(q, 1, TQ)
    kp = _pad_to(k, 1, TK)
    Tqp, Tkp = qp.shape[1], kp.shape[1]

    grid = (B, Tqp // TQ, Tkp // TK)
    out = pl.pallas_call(
        _scores_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TQ, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, TK), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tqp, Tkp), q.dtype),
        interpret=interpret,
    )(qp, kp, v_w[None, :])

    return out[:, :Tq, :Tk] / temperature


def attention_scores_xla(q, k, v_w, temperature=1.0):
    """Fused-by-XLA fallback (identical math)."""
    scores = jnp.einsum(
        "bqkd,d->bqk", jnp.tanh(q[:, :, None, :] + k[:, None, :, :]), v_w)
    return scores / temperature


# differentiable wrapper: Pallas forward, fused-XLA backward
@partial(jax.custom_vjp, nondiff_argnums=(3,))
def attention_scores(q, k, v_w, temperature=1.0):
    return attention_scores_pallas(q, k, v_w, temperature)


def _scores_fwd(q, k, v_w, temperature):
    return attention_scores_pallas(q, k, v_w, temperature), (q, k, v_w)


def _scores_bwd(temperature, res, ds):
    """Backward in Tq chunks: the naive form materializes the
    (B, Tq, Tk, D) tanh tensor once for reuse across the three grads —
    12 GB at B=32/T=768/Tk=192/D=640, which spills HBM. Chunking bounds
    the live intermediate to (B, CQ, Tk, D)."""
    q, k, v_w = res
    in_dtypes = (q.dtype, k.dtype, v_w.dtype)
    # accumulate gradients in fp32 regardless of the compute dtype
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    v_w = v_w.astype(jnp.float32)
    ds = ds.astype(jnp.float32) / temperature
    B, Tq, D = q.shape
    Tk = k.shape[1]

    # ~256 MB fp32 intermediate per chunk
    cq = max(1, int(64 * 1024 * 1024 / max(1, B * Tk * D)))
    n_chunks = -(-Tq // cq)
    pad = n_chunks * cq - Tq
    q_p = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    ds_p = jnp.pad(ds, ((0, 0), (0, pad), (0, 0)))
    q_c = q_p.reshape(B, n_chunks, cq, D).transpose(1, 0, 2, 3)
    ds_c = ds_p.reshape(B, n_chunks, cq, Tk).transpose(1, 0, 2, 3)

    def body(carry, inp):
        dk_acc, dv_acc = carry
        qc, dsc = inp                                    # (B,CQ,D),(B,CQ,Tk)
        th = jnp.tanh(qc[:, :, None, :] + k[:, None, :, :])
        sech2_v = (1.0 - th * th) * v_w
        dq_c = jnp.einsum("bqt,bqtd->bqd", dsc, sech2_v)
        dk_acc = dk_acc + jnp.einsum("bqt,bqtd->btd", dsc, sech2_v)
        dv_acc = dv_acc + jnp.einsum("bqt,bqtd->d", dsc, th)
        return (dk_acc, dv_acc), dq_c

    init = (jnp.zeros_like(k), jnp.zeros_like(v_w))
    (dk, dv), dq_chunks = jax.lax.scan(body, init, (q_c, ds_c))
    dq = dq_chunks.transpose(1, 0, 2, 3).reshape(B, n_chunks * cq, D)
    return (dq[:, :Tq].astype(in_dtypes[0]), dk.astype(in_dtypes[1]),
            dv.astype(in_dtypes[2]))


attention_scores.defvjp(_scores_fwd, _scores_bwd)


def use_pallas_default(d):
    """Pallas path is profitable on real TPUs with lane-aligned depth."""
    try:
        return jax.default_backend() == "tpu" and d % 128 == 0
    except Exception:  # pragma: no cover
        return False
