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


class TestQuantizedMatmul:
    """ops/qmm_pallas.py: the int8 weight-streaming matmul used by the
    AR decoder's serving modes (interpret mode on the CPU platform)."""

    def _case(self, M, K, N, seed=0):
        from flowtron_tpu.infer.quantize import _quantize_matrix
        rng = np.random.default_rng(seed)
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        qd = _quantize_matrix(w)
        x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
        ref = jnp.dot(x, jnp.asarray(qd["q"], jnp.float32)
                      * qd["s"][None, :])
        return x, qd, ref

    def test_w8_matches_dequant_dot(self):
        from flowtron_tpu.ops.qmm_pallas import quantized_matmul
        # shapes cover M/K padding and whole-N vs tiled-N grids
        for (M, K, N) in [(8, 80, 640), (3, 1024, 4096), (33, 1664, 512)]:
            x, qd, ref = self._case(M, K, N)
            out = quantized_matmul(x, qd["q"], qd["s"], interpret=True)
            assert out.shape == (M, N)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-4, err_msg=str((M, K, N)))

    def test_w8a8_error_bounded(self):
        from flowtron_tpu.ops.qmm_pallas import quantized_matmul
        x, qd, ref = self._case(16, 1024, 640)
        out = quantized_matmul(x, qd["q"], qd["s"], interpret=True,
                               a8=True)
        rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
        # per-row int8 activations: ~1% relative error at these dims
        assert rel < 0.03, rel

    def test_qdot_dispatch_marker(self):
        """The a8 marker is pytree structure, not a leaf, and qdot's CPU
        fallback matches resolve_weight numerics."""
        from flowtron_tpu.infer.quantize import _quantize_matrix
        from flowtron_tpu.utils.weights import qdot, resolve_weight
        rng = np.random.default_rng(1)
        w = rng.standard_normal((256, 512)).astype(np.float32)
        qd = _quantize_matrix(w, a8=True)
        assert "a8" in qd and jax.tree_util.tree_leaves({"m": qd["a8"]}) \
            == []
        x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
        got = qdot(x, qd)
        want = jnp.dot(x, resolve_weight(qd, x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
