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


class TestFusedDecoder:
    """VMEM-resident fused decoder kernel (ops/decoder_pallas.py) ==
    the lax.scan inference path (interpret mode on CPU)."""

    SMALL = dict(n_mel_channels=8, n_speaker_dim=4, n_text_channels=12,
                 n_hidden=16, n_attn_channels=8, n_lstm_layers=2)

    def _flow(self, add_gate=True, seed=0):
        from flowtron_tpu.models.ar_step import ar_step_params
        p = ar_step_params(jax.random.PRNGKey(seed), add_gate=add_gate,
                           **self.SMALL)
        p["conv"]["w"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(seed + 1), p["conv"]["w"].shape)
        return p

    def test_kernel_matches_scan(self):
        from flowtron_tpu.models.ar_step import ar_step_infer
        from flowtron_tpu.models.attention import attention_precompute
        from flowtron_tpu.ops.decoder_pallas import (
            pack_flow_weights, fused_flow_infer)
        p = self._flow()
        rng = np.random.default_rng(2)
        N, B, M, Tk = 20, 3, 8, 5
        residual = jnp.asarray(
            rng.standard_normal((N, B, M)).astype(np.float32) * 0.5)
        text = jnp.asarray(rng.standard_normal((Tk, B, 16)).astype(np.float32))
        mel_ref, attn_ref, _ = ar_step_infer(p, residual, text,
                                             gate_threshold=1e6)
        w = pack_flow_weights(p, dtype=jnp.float32)
        kp, vals = attention_precompute(p["attention_layer"], text, text)
        km = jnp.ones((B, Tk), jnp.float32)
        mel_f, attn_f, gates = fused_flow_infer(w, residual, kp, vals, km,
                                                1.0, interpret=True)
        np.testing.assert_allclose(np.asarray(mel_f), np.asarray(mel_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(attn_f.transpose(1, 0, 2)),
                                   np.asarray(attn_ref), atol=1e-5)

    def test_full_model_fused_dispatch(self):
        """flowtron_infer(fused=True): both flows (fwd + back-step flip),
        gate n_valid, and key_mask agree with the scan path."""
        from flowtron_tpu.models import flowtron_init, flowtron_infer
        params, config = flowtron_init(
            jax.random.PRNGKey(0), n_flows=2, use_gate_layer=True,
            n_speakers=2, n_speaker_dim=4, n_text=185, n_text_dim=12,
            n_mel_channels=8, n_hidden=16, n_attn_channels=8,
            n_lstm_layers=2, mel_encoder_n_hidden=8)
        for i, f in enumerate(params["flows"]):
            k = jax.random.fold_in(jax.random.PRNGKey(1), i)
            f["conv"]["w"] = 0.05 * jax.random.normal(k, f["conv"]["w"].shape)
        rng = np.random.default_rng(3)
        B, N = 2, 20
        residual = jnp.asarray(
            (rng.standard_normal((B, 8, N)) * 0.5).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 185, (B, 7)))
        sids = jnp.asarray([0, 1])
        in_lens = jnp.asarray([7, 5])

        for thresh in (1e6, 0.45):
            mel_s, attns_s, nv_s = flowtron_infer(
                params, config, residual, sids, text,
                gate_threshold=thresh, in_lens=in_lens)
            mel_f, attns_f, nv_f = flowtron_infer(
                params, config, residual, sids, text,
                gate_threshold=thresh, in_lens=in_lens, fused=True)
            np.testing.assert_array_equal(np.asarray(nv_s), np.asarray(nv_f))
            np.testing.assert_allclose(np.asarray(mel_f), np.asarray(mel_s),
                                       atol=1e-4)
            for a_s, a_f in zip(attns_s, attns_f):
                np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_s),
                                           atol=1e-4)

    def test_fused_falls_back_on_quantized(self):
        """Quantized flows are outside the kernel subset: fused=True must
        still produce correct output via the scan fallback."""
        from flowtron_tpu.models.ar_step import ar_step_infer
        from flowtron_tpu.infer.quantize import quantize_flows_for_inference
        from flowtron_tpu.ops.decoder_pallas import pack_flow_weights
        p = self._flow()
        q = quantize_flows_for_inference({"flows": [p]}, min_elems=64
                                         )["flows"][0]
        assert pack_flow_weights(q) is None
        rng = np.random.default_rng(4)
        residual = jnp.asarray(
            rng.standard_normal((6, 2, 8)).astype(np.float32) * 0.5)
        text = jnp.asarray(rng.standard_normal((5, 2, 16)).astype(np.float32))
        mel_q, _, _ = ar_step_infer(q, residual, text, gate_threshold=1e6,
                                    fused=True)
        mel_ref, _, _ = ar_step_infer(q, residual, text, gate_threshold=1e6)
        np.testing.assert_allclose(np.asarray(mel_q), np.asarray(mel_ref),
                                   atol=1e-6)

    def test_early_exit_semantics(self):
        """fused="early" skips chunks after all gates fire: n_valid and
        the valid prefix match the scan path exactly; later frames are
        zeros (unspecified by contract), never NaN."""
        from flowtron_tpu.models import flowtron_init, flowtron_infer
        params, config = flowtron_init(
            jax.random.PRNGKey(0), n_flows=2, use_gate_layer=True,
            n_speakers=2, n_speaker_dim=4, n_text=185, n_text_dim=12,
            n_mel_channels=8, n_hidden=16, n_attn_channels=8,
            n_lstm_layers=2, mel_encoder_n_hidden=8)
        for i, f in enumerate(params["flows"]):
            k = jax.random.fold_in(jax.random.PRNGKey(1), i)
            f["conv"]["w"] = 0.05 * jax.random.normal(k, f["conv"]["w"].shape)
        gate = params["flows"][-1]["gate_layer"]
        gate["w"] = jnp.ones_like(gate["w"]) * 0.2

        rng = np.random.default_rng(3)
        B, N = 3, 40  # chunk=10 -> 4 grid steps
        residual = jnp.asarray(
            (rng.standard_normal((B, 8, N)) * 0.8).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 185, (B, 7)))
        sids = jnp.asarray([0, 1, 0])

        # 0.35: every stream fires in chunk 0 -> chunks 1-3 skipped;
        # 0.55: one early hit, two never -> no chunk skipped
        for thresh in (0.35, 0.55):
            mel_s, _, nv_s = flowtron_infer(
                params, config, residual, sids, text, gate_threshold=thresh)
            mel_e, _, nv_e = flowtron_infer(
                params, config, residual, sids, text, gate_threshold=thresh,
                fused="early")
            np.testing.assert_array_equal(np.asarray(nv_s), np.asarray(nv_e))
            for b in range(B):
                n = int(np.asarray(nv_s)[b])
                np.testing.assert_allclose(
                    np.asarray(mel_e)[b, :, :n], np.asarray(mel_s)[b, :, :n],
                    atol=1e-4, err_msg=f"thresh={thresh} b={b}")
            assert not np.isnan(np.asarray(mel_e)).any()
