"""Mask utility edge cases."""

import numpy as np
import jax.numpy as jnp

from flowtron_tpu.utils.masks import sequence_mask, flip_within_length_indices


class TestSequenceMask:
    def test_basic(self):
        m = np.asarray(sequence_mask(jnp.asarray([3, 1, 5]), 5))
        assert m.tolist() == [
            [True, True, True, False, False],
            [True, False, False, False, False],
            [True, True, True, True, True],
        ]

    def test_zero_length(self):
        m = np.asarray(sequence_mask(jnp.asarray([0, 2]), 3))
        assert m[0].tolist() == [False, False, False]


class TestFlipIndices:
    def test_full_length(self):
        idx = np.asarray(flip_within_length_indices(jnp.asarray([4]), 4))
        assert idx[0].tolist() == [3, 2, 1, 0]

    def test_partial(self):
        idx = np.asarray(flip_within_length_indices(jnp.asarray([2]), 5))
        # valid prefix reversed, padding region self-mapped (within bounds)
        assert idx[0][:2].tolist() == [1, 0]
        assert (idx[0] >= 0).all() and (idx[0] <= 4).all()
        assert sorted(idx[0][2:].tolist()) == [2, 3, 4]

    def test_involution(self):
        lengths = jnp.asarray([7, 3, 10])
        idx = np.asarray(flip_within_length_indices(lengths, 10))
        for b, L in enumerate([7, 3, 10]):
            twice = idx[b][idx[b]]
            assert twice[:L].tolist() == list(range(L))
