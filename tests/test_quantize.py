"""Weight-only int8 inference quantization: quality + mechanics."""

import numpy as np
import jax
import jax.numpy as jnp

from flowtron_tpu.models import flowtron_init, flowtron_infer
from flowtron_tpu.infer.quantize import (
    quantize_flows_for_inference, _quantize_matrix, _quantize_matrix_int4,
    weight_shape,
)
from flowtron_tpu.utils.weights import resolve_weight

SMALL = dict(n_speakers=2, n_speaker_dim=8, n_text=185, n_text_dim=32,
             n_mel_channels=12, n_hidden=64, n_attn_channels=32,
             n_lstm_layers=2, mel_encoder_n_hidden=16)


class TestQuantize:
    def test_roundtrip_error_small(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((256, 512)).astype(np.float32)
        q = _quantize_matrix(w)
        w2 = np.asarray(q["q"], np.float32) * np.asarray(q["s"])[None, :]
        rel = np.abs(w2 - w).max() / np.abs(w).max()
        assert rel < 0.01  # <= 1/254 of the per-channel max

    def test_infer_quality(self):
        """int8 flows vs fp32 flows: small mel delta on the same z."""
        params, config = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                       use_gate_layer=True, **SMALL)
        for i, f in enumerate(params["flows"]):
            k = jax.random.fold_in(jax.random.PRNGKey(1), i)
            f["conv"]["w"] = 0.05 * jax.random.normal(k, f["conv"]["w"].shape)

        rng = np.random.default_rng(2)
        residual = jnp.asarray(
            (rng.standard_normal((1, 12, 16)) * 0.5).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 185, (1, 7)))
        sids = jnp.asarray([0])

        mel_fp, _, _ = flowtron_infer(params, config, residual, sids, text,
                                      gate_threshold=1e6)
        qparams = quantize_flows_for_inference(params, min_elems=1024)
        # quantized leaves present
        assert isinstance(qparams["flows"][0]["lstm"]["layers"][0]["w_ih"],
                          dict)
        assert weight_shape(
            qparams["flows"][0]["lstm"]["layers"][0]["w_ih"])[1] == 4 * 64
        mel_q, _, _ = flowtron_infer(qparams, config, residual, sids, text,
                                     gate_threshold=1e6)
        mae = float(jnp.mean(jnp.abs(mel_q - mel_fp)))
        scale = float(jnp.mean(jnp.abs(mel_fp))) + 1e-9
        # measured 6.3e-4 on this seed; 0.005 gives ~8x headroom while
        # still catching any real quantization regression
        assert mae / scale < 0.005, (mae, scale)

    def test_int4_roundtrip(self):
        """Packed int4 dequant matches a numpy nibble-unpack oracle and
        bounds the weight error near the uniform-int4 gaussian floor."""
        rng = np.random.default_rng(0)
        w = rng.standard_normal((256, 512)).astype(np.float32)
        q = _quantize_matrix_int4(w)
        assert weight_shape(q) == (256, 512)
        assert q["q4"].shape == (128, 512) and q["q4"].dtype == jnp.int8
        qi = np.asarray(q["q4"]).astype(np.int32)
        lo, hi = (qi << 28) >> 28, qi >> 4          # sign-extended nibbles
        full = np.concatenate([lo, hi], 0).astype(np.float32)
        s = np.asarray(q["s"])
        g = 256 // s.shape[0]
        ref = (full.reshape(s.shape[0], g, 512) * s[:, None, :]
               ).reshape(256, 512)
        got = np.asarray(resolve_weight(q, jnp.float32))
        # resolve_weight dequantizes in bf16 (serving dtype)
        np.testing.assert_allclose(got, ref, atol=0.04)
        rel = np.sqrt(((ref - w) ** 2).mean() / (w ** 2).mean())
        assert rel < 0.12, rel  # MSE-optimal int4 gaussian floor ~0.10

    def test_int4_infer_quality(self):
        """w4 flows vs fp32 flows: bounded mel delta on the same z."""
        params, config = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                       use_gate_layer=True, **SMALL)
        for i, f in enumerate(params["flows"]):
            k = jax.random.fold_in(jax.random.PRNGKey(1), i)
            f["conv"]["w"] = 0.05 * jax.random.normal(k, f["conv"]["w"].shape)
        rng = np.random.default_rng(2)
        residual = jnp.asarray(
            (rng.standard_normal((1, 12, 16)) * 0.5).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 185, (1, 7)))
        sids = jnp.asarray([0])
        mel_fp, _, _ = flowtron_infer(params, config, residual, sids, text,
                                      gate_threshold=1e6)
        qparams = quantize_flows_for_inference(params, min_elems=1024,
                                               mode="w4")
        assert "q4" in qparams["flows"][0]["lstm"]["layers"][0]["w_ih"]
        mel_q, _, _ = flowtron_infer(qparams, config, residual, sids, text,
                                     gate_threshold=1e6)
        mae = float(jnp.mean(jnp.abs(mel_q - mel_fp)))
        scale = float(jnp.mean(jnp.abs(mel_fp))) + 1e-9
        # measured 0.0086 on this seed; int4 is the speed-over-quality
        # serving point (w8 is ~0.0006 on the same seed)
        assert mae / scale < 0.03, (mae, scale)

    def test_training_params_untouched(self):
        params, config = flowtron_init(jax.random.PRNGKey(0), n_flows=1,
                                       use_gate_layer=True, **SMALL)
        q = quantize_flows_for_inference(params, min_elems=1024)
        # original pytree unchanged (no in-place mutation)
        assert not isinstance(params["flows"][0]["lstm"]["layers"][0]["w_ih"],
                              dict)
        # encoder/embeddings not quantized
        assert not isinstance(q["encoder"]["lstm"]["layers"][0]["fwd"]["w_ih"],
                              dict)
