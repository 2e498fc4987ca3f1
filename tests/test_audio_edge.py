"""Audio-path edge cases: ultra-short inputs must not crash the mel
extractor or its native/numpy parity (server-side data loaders meet
truncated files)."""

import numpy as np
import pytest

from flowtron_tpu.audio.stft import MelSpectrogram


@pytest.fixture(scope="module")
def ms():
    return MelSpectrogram()


class TestShortAudio:
    @pytest.mark.parametrize("n", [1, 255, 256, 257, 1023, 1024, 1025])
    def test_mel_numpy_short(self, ms, n):
        audio = (np.random.default_rng(n).standard_normal(n) * 0.1
                 ).astype(np.float32)
        mel = ms.mel_numpy(audio)
        assert mel.shape[0] == 80
        assert mel.shape[1] == n // 256 + 1
        assert np.isfinite(mel).all()

    @pytest.mark.parametrize("n", [1, 255, 1025])
    def test_native_matches_numpy_short(self, ms, n):
        from flowtron_tpu import native
        if not native.available():
            assert native.build()
        nm = native.NativeMel(np.asarray(ms.window),
                              np.asarray(ms.mel_basis), n_threads=1)
        audio = (np.random.default_rng(n).standard_normal(n) * 0.1
                 ).astype(np.float32)
        np.testing.assert_allclose(nm(audio), ms.mel_numpy(audio),
                                   atol=1e-5)

    def test_silence(self, ms):
        mel = ms.mel_numpy(np.zeros(4096, np.float32))
        # log-clip floor everywhere
        assert np.allclose(mel, np.log(1e-5), atol=1e-6)
