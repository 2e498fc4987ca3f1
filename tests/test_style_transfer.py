"""Style transfer + denoiser tests."""

import numpy as np
import jax
import jax.numpy as jnp

from flowtron_tpu.infer.style_transfer import posterior_mean, style_transfer
from flowtron_tpu.models import flowtron_init


class TestPosterior:
    def test_tiling_and_ridge(self):
        z1 = np.ones((4, 3), np.float32)          # (T, mel)
        z2 = 3 * np.ones((6, 3), np.float32)
        mu = posterior_mean([z1, z2], [4, 6], n_frames=8, lam=1e-4)
        assert mu.shape == (3, 8)
        # z_bar = 2 everywhere; ratio = 2/1e-4 -> mu ~= 2
        np.testing.assert_allclose(mu, 2.0, rtol=1e-4)

    def test_strong_prior_shrinks(self):
        z = np.ones((4, 2), np.float32)
        mu = posterior_mean([z], [4], n_frames=4, lam=10.0)
        # ratio = 0.1 -> mu = 0.1/1.1 ~ 0.0909
        np.testing.assert_allclose(mu, 0.1 / 1.1, rtol=1e-5)


class TestStyleTransferE2E:
    def test_runs(self):
        SMALL = dict(n_speakers=2, n_speaker_dim=4, n_text=185,
                     n_text_dim=16, n_mel_channels=8, n_hidden=12,
                     n_attn_channels=8, n_lstm_layers=2,
                     mel_encoder_n_hidden=8)
        params, config = flowtron_init(jax.random.PRNGKey(0), n_flows=2,
                                       use_gate_layer=True, **SMALL)
        rng = np.random.default_rng(0)
        B, T, Tk = 2, 10, 5
        ref_batch = {
            "mel": rng.standard_normal((B, 8, T)).astype(np.float32),
            "speaker_ids": np.array([0, 1]),
            "text": rng.integers(1, 185, (B, Tk)),
            "in_lens": np.array([5, 4]),
            "out_lens": np.array([10, 7]),
        }
        mel, n = style_transfer(params, config, ref_batch,
                                list(rng.integers(1, 185, 6)), 0,
                                n_frames=12, gate_threshold=1e6)
        assert mel.shape == (8, n)
        assert n == 12  # gate off
        assert np.isfinite(mel).all()


class TestDenoiser:
    def test_bias_subtraction(self):
        from flowtron_tpu.vocoder import waveglow_init
        from flowtron_tpu.vocoder.denoiser import Denoiser
        params, config = waveglow_init(
            jax.random.PRNGKey(0), n_mel_channels=8, n_flows=2,
            n_group=8, n_early_every=4, n_early_size=2, n_layers=1,
            n_channels=8)
        den = Denoiser(params, config, n_mel_channels=8)
        assert den.bias_spec.shape[1] == 513
        audio = jnp.asarray(np.random.default_rng(1)
                            .standard_normal((1, 4096)).astype(np.float32))
        out = den(audio, strength=0.05)
        assert out.ndim == 2 and np.isfinite(np.asarray(out)).all()

    def test_streaming_matches_offline(self):
        """StreamingDenoiser emits exactly the offline Denoiser's
        samples under arbitrary chunkings (the contract that lets the
        serving stream path share the batch path's -d semantics)."""
        from flowtron_tpu.vocoder import waveglow_init
        from flowtron_tpu.vocoder.denoiser import (Denoiser,
                                                   StreamingDenoiser)
        params, config = waveglow_init(
            jax.random.PRNGKey(0), n_mel_channels=8, n_flows=2,
            n_group=8, n_early_every=4, n_early_size=2, n_layers=1,
            n_channels=8)
        den = Denoiser(params, config, n_mel_channels=8)
        rng = np.random.default_rng(7)
        for T, splits in [(8192, [4096, 4096]),
                          (10240, [1536, 2560, 4096, 2048]),
                          (5000, [1200, 1800, 2000]),  # T % hop != 0
                          (4096, [4096]),
                          (7300, [700, 600, 6000]),    # chunk < pad
                          (6000, [0, 1, 511, 488, 5000])]:  # empty+tiny
            audio = rng.standard_normal(T).astype(np.float32) * 0.3
            off = np.asarray(den(jnp.asarray(audio[None]),
                                 strength=0.07))[0]
            sd = StreamingDenoiser(den, strength=0.07)
            parts, i = [], 0
            for s in splits:
                parts.append(sd.feed(audio[i:i + s]))
                i += s
            parts.append(sd.flush())
            stream = np.concatenate(parts)
            assert stream.shape == off.shape, (T, stream.shape)
            err = np.abs(stream - off.astype(np.float64)).max()
            assert err < 2e-4, (T, splits, err)  # fp32-vs-fp64 rounding

    def test_streaming_denoiser_resets_after_flush(self):
        """flush() leaves the instance reusable for the next utterance."""
        from flowtron_tpu.vocoder import waveglow_init
        from flowtron_tpu.vocoder.denoiser import (Denoiser,
                                                   StreamingDenoiser)
        params, config = waveglow_init(
            jax.random.PRNGKey(0), n_mel_channels=8, n_flows=2,
            n_group=8, n_early_every=4, n_early_size=2, n_layers=1,
            n_channels=8)
        den = Denoiser(params, config, n_mel_channels=8)
        audio = (np.random.default_rng(3).standard_normal(4096)
                 .astype(np.float32) * 0.3)
        sd = StreamingDenoiser(den, strength=0.1)
        a = np.concatenate([sd.feed(audio), sd.flush()])
        b = np.concatenate([sd.feed(audio), sd.flush()])
        np.testing.assert_array_equal(a, b)
