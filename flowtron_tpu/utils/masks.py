"""Length-mask helpers (static-shape, TPU-friendly).

The reference builds masks with data-dependent ``max(lengths)`` and CUDA
tensors (reference:flowtron.py:25-50); here shapes are static (padded) and
masks are pure jnp, so everything stays inside jit.
"""

import jax.numpy as jnp


def sequence_mask(lengths, max_len):
    """(B,) lengths -> (B, max_len) boolean mask, True at valid steps."""
    ids = jnp.arange(max_len, dtype=lengths.dtype)
    return ids[None, :] < lengths[:, None]


def flip_within_length_indices(lengths, max_len):
    """Per-row time indices that reverse the valid prefix, keep padding last.

    Replaces the reference's flip+roll loops (reference:flowtron.py:606-627):
    ``out[b, t] = x[b, idx[b, t]]`` gives ``x[b, L_b-1-t]`` for ``t < L_b``
    and the (zero) padding region for ``t >= L_b``.
    """
    t = jnp.arange(max_len)
    # valid region: L-1-t ; padding region: maps t in [L, max) onto [L, max)
    idx = jnp.where(
        t[None, :] < lengths[:, None],
        lengths[:, None] - 1 - t[None, :],
        max_len - 1 - t[None, :] + lengths[:, None],
    )
    return jnp.clip(idx, 0, max_len - 1)
