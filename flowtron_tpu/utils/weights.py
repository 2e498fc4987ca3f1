"""Weight-leaf helpers shared by layers/ops (dependency-free)."""

import jax
import jax.numpy as jnp


def resolve_weight(w, dtype=None):
    """Materialize a (possibly quantized) weight for compute.

    Quantized weights are dicts produced by infer/quantize.py:
      int8: {"q": int8 (in, out), "s": f32 (out,)}
      int4: {"q4": int8 (in//2, out) two nibbles/byte,
             "s": f32 (n_groups, out) group-wise scales}
    The dequant sits behind an optimization barrier so XLA cannot hoist
    it out of an inference scan — keeping the loop streaming the
    quantized bytes (the AR scan is HBM-bandwidth-bound on weight reads).
    """
    if isinstance(w, dict) and "q" in w:
        q = jax.lax.optimization_barrier(w["q"])
        out = q.astype(jnp.bfloat16) * w["s"].astype(jnp.bfloat16)
        return out.astype(dtype) if dtype is not None else out
    if isinstance(w, dict) and "q4" in w:
        q = jax.lax.optimization_barrier(w["q4"])
        # low nibble = rows [0, in/2), high nibble = rows [in/2, in);
        # shift pairs sign-extend, the concat is contiguous (no
        # interleave relayout — see quantize._quantize_matrix_int4)
        lo = jnp.right_shift(jnp.left_shift(q, 4), 4)
        hi = jnp.right_shift(q, 4)
        full = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
        s = w["s"].astype(jnp.bfloat16)              # (n_groups, out)
        n_groups, n_out = s.shape
        g = full.shape[0] // n_groups
        out = (full.reshape(n_groups, g, n_out) * s[:, None, :]
               ).reshape(-1, n_out)
        return out.astype(dtype) if dtype is not None else out
    return w


def _qmm_eligible(x, w, max_rows=512):
    """The Pallas streaming matmul only dispatches for "a8"-marked
    leaves (int8 x int8 needs the kernel; for weight-only int8, XLA's
    dequant-behind-barrier path measured FASTER in-model — 176 vs 210
    us/step at B=128 — because per-op custom calls break fusion). Needs
    a real TPU backend and a small row count: the kernel keeps the whole
    x block in VMEM — right for the per-step scan dots, wrong for the
    big once-per-utterance projections."""
    if not (isinstance(w, dict) and "q" in w and "a8" in w):
        return False
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if rows > max_rows:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def qdot(x, w, out_dtype=None):
    """dot(x, dequant(w)) for a possibly-quantized weight leaf.

    On TPU, quantized leaves dispatch to ops/qmm_pallas.quantized_matmul:
    the int8 -> compute-dtype convert runs on VMEM tiles inside the
    kernel (no dequantized HBM copy) and leaves carrying the "a8" marker
    additionally use the int8 x int8 MXU path. Anywhere else this is the
    plain dot over resolve_weight. fp32 MXU accumulation either way;
    output cast to out_dtype (default x.dtype).
    """
    out_dtype = out_dtype or x.dtype
    if _qmm_eligible(x, w):
        from flowtron_tpu.ops.qmm_pallas import quantized_matmul
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        out = quantized_matmul(x2, w["q"], w["s"], out_dtype=out_dtype,
                               a8="a8" in w)
        return out.reshape(*lead, out.shape[-1])
    wd = resolve_weight(w, x.dtype) if isinstance(w, dict) else w
    return jnp.dot(x, wd,
                   preferred_element_type=jnp.float32).astype(out_dtype)
