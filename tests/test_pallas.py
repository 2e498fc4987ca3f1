"""Pallas attention-score kernel vs the XLA fallback (interpret mode on
the CPU test platform)."""

import numpy as np
import jax
import jax.numpy as jnp

from flowtron_tpu.ops.attention_pallas import (
    attention_scores_pallas, attention_scores_xla,
)


class TestPallasAttentionScores:
    def _data(self, B=2, Tq=20, Tk=150, D=128, seed=0):
        rng = np.random.default_rng(seed)
        q = rng.standard_normal((B, Tq, D)).astype(np.float32)
        k = rng.standard_normal((B, Tk, D)).astype(np.float32)
        v = rng.standard_normal(D).astype(np.float32)
        return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)

    def test_matches_xla_unaligned_shapes(self):
        q, k, v = self._data()
        ours = attention_scores_pallas(q, k, v, interpret=True)
        ref = attention_scores_xla(q, k, v)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5)

    def test_matches_xla_aligned(self):
        q, k, v = self._data(B=1, Tq=32, Tk=256, D=128)
        ours = attention_scores_pallas(q, k, v, temperature=2.0,
                                       interpret=True)
        ref = attention_scores_xla(q, k, v, temperature=2.0)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5)

    def test_temperature(self):
        q, k, v = self._data(B=1, Tq=16, Tk=128, D=128)
        s1 = attention_scores_pallas(q, k, v, temperature=1.0,
                                     interpret=True)
        s2 = attention_scores_pallas(q, k, v, temperature=4.0,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(s1) / 4.0, np.asarray(s2),
                                   atol=1e-6)


class TestCustomVJP:
    def test_grad_matches_xla(self):
        """Pallas forward + custom backward == jax.grad of the XLA path."""
        from flowtron_tpu.ops.attention_pallas import attention_scores
        rng = np.random.default_rng(3)
        B, Tq, Tk, D = 1, 12, 40, 128
        q = jnp.asarray(rng.standard_normal((B, Tq, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, Tk, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal(D).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((B, Tq, Tk)).astype(np.float32))

        # interpret-mode pallas under grad (CPU test platform)
        def f_pallas(q, k, v):
            from flowtron_tpu.ops import attention_pallas as ap
            s, _ = jax.vjp(lambda q, k, v: ap.attention_scores_pallas(
                q, k, v, 1.0, interpret=True), q, k, v)
            return s

        def loss_x(q, k, v):
            return jnp.sum(attention_scores_xla(q, k, v, 2.0) * w)

        # use the custom-vjp backward directly
        from flowtron_tpu.ops.attention_pallas import _scores_bwd
        dq, dk, dv = _scores_bwd(2.0, (q, k, v), w)
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(gx[0]),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(gx[1]),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(gx[2]),
                                   atol=2e-3)
