"""Weight-leaf helpers shared by layers/ops (dependency-free)."""

import jax
import jax.numpy as jnp


def resolve_weight(w, dtype=None):
    """Materialize a (possibly int8-quantized) weight for compute.

    Quantized weights are dicts {"q": int8 (in, out), "s": f32 (out,)}
    produced by infer/quantize.py. The dequant sits behind an
    optimization barrier so XLA cannot hoist it out of an inference scan
    — keeping the loop streaming int8 bytes (the AR scan is
    HBM-bandwidth-bound on weight reads).
    """
    if isinstance(w, dict) and "q" in w:
        q = jax.lax.optimization_barrier(w["q"])
        out = q.astype(jnp.bfloat16) * w["s"].astype(jnp.bfloat16)
        return out.astype(dtype) if dtype is not None else out
    return w
