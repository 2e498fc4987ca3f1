"""WaveGlow bias denoiser (reference notebook cell 2/7; waveglow repo's
Denoiser): estimate the vocoder's bias spectrum by synthesizing from a
zero mel, then spectrally subtract it from generated audio."""

import numpy as np
import jax.numpy as jnp

from flowtron_tpu.audio.stft import MelSpectrogram, _frame_signal
from flowtron_tpu.audio.griffin_lim import InverseSTFT


class Denoiser:
    def __init__(self, wg_params, wg_config, filter_length=1024,
                 hop_length=256, win_length=1024, n_mel_channels=80,
                 mode="zeros"):
        from flowtron_tpu.vocoder.waveglow import waveglow_infer
        self.filter_length = filter_length
        self.hop_length = hop_length
        self._ms = MelSpectrogram(filter_length, hop_length, win_length,
                                  n_mel_channels)
        self._istft = InverseSTFT(filter_length, hop_length, win_length)

        if mode == "zeros":
            mel_input = jnp.zeros((1, n_mel_channels, 88), jnp.float32)
        elif mode == "normal":
            mel_input = jnp.asarray(
                np.random.default_rng(0).standard_normal(
                    (1, n_mel_channels, 88)).astype(np.float32))
        else:
            raise ValueError(f"unsupported mode {mode}")

        bias_audio = waveglow_infer(wg_params, wg_config, mel_input,
                                    sigma=0.0)
        spec = self._transform(bias_audio)
        self.bias_spec = jnp.abs(spec)[:, :, 0][:, :, None]

    def _transform(self, audio):
        frames = _frame_signal(audio, self.filter_length, self.hop_length)
        return jnp.fft.rfft(frames * self._ms.window[None, None, :],
                            axis=-1).swapaxes(1, 2)

    def __call__(self, audio, strength=0.1):
        """audio (B, T) -> denoised audio (B, ~T)."""
        spec = self._transform(audio)
        mag, phase = jnp.abs(spec), jnp.angle(spec)
        mag = jnp.clip(mag - strength * self.bias_spec, 0.0, None)
        return self._istft(mag, phase)
