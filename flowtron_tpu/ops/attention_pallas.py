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
    q, k, v_w = res
    ds = ds / temperature
    th = jnp.tanh(q[:, :, None, :] + k[:, None, :, :])   # fused by XLA
    sech2_v = (1.0 - th * th) * v_w                      # (B,Tq,Tk,D) virtual
    dq = jnp.einsum("bqt,bqtd->bqd", ds, sech2_v)
    dk = jnp.einsum("bqt,bqtd->btd", ds, sech2_v)
    dv = jnp.einsum("bqt,bqtd->d", ds, th)
    return dq, dk, dv


attention_scores.defvjp(_scores_fwd, _scores_bwd)


def use_pallas_default(d):
    """Pallas path is profitable on real TPUs with lane-aligned depth."""
    try:
        return jax.default_backend() == "tpu" and d % 128 == 0
    except Exception:  # pragma: no cover
        return False
