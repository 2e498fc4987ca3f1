"""STFT + mel spectrogram, TPU-native.

Where the reference computes the STFT as a conv1d against a precomputed DFT
basis (reference:audio_processing.py:172-235), this implementation frames the
signal and uses ``jnp.fft.rfft`` — XLA fuses window multiply, FFT, magnitude,
mel matmul (MXU), and log-compression into a single device program. The
numerical result is identical: conv against a windowed Fourier basis IS the
DFT of the windowed frames.

Frame/pad conventions match the reference exactly: reflect padding of
``filter_length // 2`` on each side, periodic Hann window (zero-center-padded
to ``filter_length`` when ``win_length < filter_length``), hop stride,
``n_frames = T // hop + 1``.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from flowtron_tpu.audio.mel import mel_filterbank


def hann_window(win_length, dtype=np.float32):
    """Periodic (fftbins=True) Hann window, as scipy.signal.get_window."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def pad_center(window, size):
    """Zero-pad a window symmetrically to ``size`` samples."""
    n = len(window)
    lpad = (size - n) // 2
    return np.pad(window, (lpad, size - n - lpad))


@partial(jax.jit, static_argnames=("filter_length", "hop_length"))
def _frame_signal(audio, filter_length, hop_length):
    """(B, T) -> (B, n_frames, filter_length) frame matrix.

    When hop divides the frame length (the Tacotron 1024/256 case), frames
    are built from k = filter_length/hop shifted slice+reshape views and one
    concat — pure layout ops, far cheaper for XLA than a 2D gather.
    """
    pad = filter_length // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = audio.shape[1] // hop_length + 1
    if filter_length % hop_length == 0:
        k = filter_length // hop_length
        need = (n_frames + k - 1) * hop_length
        if x.shape[1] < need:
            x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
        segs = [
            x[:, i * hop_length:(i + n_frames) * hop_length]
            .reshape(x.shape[0], n_frames, hop_length)
            for i in range(k)
        ]
        return jnp.concatenate(segs, axis=-1)
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(filter_length)[None, :])
    return x[:, idx]


class MelSpectrogram:
    """waveform -> 80-channel log-mel, matching TacotronSTFT semantics
    (reference:audio_processing.py:96-134).
    """

    def __init__(self, filter_length=1024, hop_length=256, win_length=1024,
                 n_mel_channels=80, sampling_rate=22050, mel_fmin=0.0,
                 mel_fmax=8000.0, clip_val=1e-5):
        assert filter_length >= win_length
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mel_channels = n_mel_channels
        self.sampling_rate = sampling_rate
        self.clip_val = clip_val

        window = hann_window(win_length)
        self.window = jnp.asarray(pad_center(window, filter_length))
        self.mel_basis = jnp.asarray(mel_filterbank(
            sampling_rate, filter_length, n_mel_channels, mel_fmin, mel_fmax))

        self._mel_fn = jax.jit(self._mel_impl)
        self._mag_fn = jax.jit(self._magnitude_impl)

    def _magnitude_impl(self, audio):
        frames = _frame_signal(audio, self.filter_length, self.hop_length)
        spec = jnp.fft.rfft(frames * self.window[None, None, :], axis=-1)
        # (B, n_frames, n_bins) -> (B, n_bins, n_frames)
        return jnp.abs(spec).swapaxes(1, 2)

    def _mel_impl(self, audio):
        magnitudes = self._magnitude_impl(audio)
        mel = jnp.einsum("mf,bft->bmt", self.mel_basis, magnitudes)
        return jnp.log(jnp.clip(mel, min=self.clip_val))

    def magnitude(self, audio):
        """(B, T) in [-1, 1] -> (B, 1 + n_fft/2, n_frames) magnitudes."""
        return self._mag_fn(audio)

    def __call__(self, audio):
        """(B, T) in [-1, 1] -> (B, n_mel_channels, n_frames) log-mel."""
        return self._mel_fn(audio)

    def mel_from_magnitude(self, magnitudes):
        mel = jnp.einsum("mf,bft->bmt", self.mel_basis, magnitudes)
        return jnp.log(jnp.clip(mel, min=self.clip_val))

    def mel_numpy(self, audio):
        """Host-side (numpy) log-mel for the data pipeline — identical math
        without a device round-trip per utterance. audio: (T,) in [-1, 1].
        Returns (n_mel, n_frames) float32.
        """
        window = np.asarray(self.window)
        basis = np.asarray(self.mel_basis)
        pad = self.filter_length // 2
        x = np.pad(audio.astype(np.float64), pad, mode="reflect")
        n_frames = len(audio) // self.hop_length + 1
        stride = x.strides[0]
        frames = np.lib.stride_tricks.as_strided(
            x, (n_frames, self.filter_length),
            (self.hop_length * stride, stride), writeable=False)
        spec = np.abs(np.fft.rfft(frames * window[None, :], axis=-1))
        mel = basis @ spec.T.astype(np.float32)
        return np.log(np.clip(mel, self.clip_val, None)).astype(np.float32)


def dynamic_range_compression(x, C=1, clip_val=1e-5):
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x, C=1):
    return jnp.exp(x) / C
