"""Inverse STFT and Griffin-Lim phase recovery (vocoder fallback).

Capability parity with reference:audio_processing.py:59-75,237-265: the
inverse transform applies window-sumsquare normalization and hop scaling;
griffin_lim iterates magnitude-constrained phase estimation. Implemented as
irfft + overlap-add (via segment scatter) instead of conv_transpose.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from flowtron_tpu.audio.stft import hann_window, pad_center


def window_sumsquare(win_length, filter_length, hop_length, n_frames):
    """Sum-square envelope of the analysis window (numpy, host-side)."""
    n = filter_length + hop_length * (n_frames - 1)
    x = np.zeros(n, dtype=np.float64)
    win_sq = pad_center(hann_window(win_length).astype(np.float64) ** 2,
                        filter_length)
    for i in range(n_frames):
        s = i * hop_length
        x[s:min(n, s + filter_length)] += win_sq[:max(0, min(filter_length, n - s))]
    return x


@partial(jax.jit, static_argnames=("filter_length", "hop_length"))
def _overlap_add(frames, filter_length, hop_length):
    """(B, n_frames, filter_length) -> (B, n_samples) overlap-add.

    With hop dividing the frame length, each of the k = filter_length/hop
    within-frame chunks reshapes to a contiguous strip; summing the k
    shifted strips is pure layout + add (no scatter).
    """
    b, n_frames, _ = frames.shape
    n = filter_length + hop_length * (n_frames - 1)
    if filter_length % hop_length == 0:
        k = filter_length // hop_length
        chunks = frames.reshape(b, n_frames, k, hop_length)
        out = jnp.zeros((b, n), frames.dtype)
        for i in range(k):
            strip = chunks[:, :, i, :].reshape(b, n_frames * hop_length)
            out = out + jnp.pad(
                strip, ((0, 0), (i * hop_length, (k - 1 - i) * hop_length)))
        return out
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(filter_length)[None, :]).reshape(-1)
    out = jnp.zeros((b, n), frames.dtype)
    return out.at[:, idx].add(frames.reshape(b, -1))


class InverseSTFT:
    def __init__(self, filter_length=1024, hop_length=256, win_length=1024):
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.window = jnp.asarray(pad_center(hann_window(win_length),
                                             filter_length))

    def __call__(self, magnitude, phase):
        """(B, n_bins, n_frames) mag/phase -> (B, T) waveform."""
        n_frames = magnitude.shape[-1]
        spec = magnitude * jnp.exp(1j * phase)
        frames = jnp.fft.irfft(spec.swapaxes(1, 2), n=self.filter_length,
                               axis=-1)
        frames = frames * self.window[None, None, :]
        signal = _overlap_add(frames, self.filter_length, self.hop_length)

        wss = window_sumsquare(self.win_length, self.filter_length,
                               self.hop_length, n_frames)
        tiny = np.finfo(np.float32).tiny
        norm = np.where(wss > tiny, wss, 1.0)
        signal = signal / jnp.asarray(norm, signal.dtype)[None, :]
        # Note: unlike the conv-basis reference, irfft already includes the
        # 1/filter_length factor, so no hop-ratio rescale is needed here.

        pad = self.filter_length // 2
        return signal[:, pad:-pad]


def griffin_lim(magnitudes, stft_forward, stft_inverse, n_iters=30, key=None):
    """Recover a waveform from magnitudes by iterative phase estimation."""
    if key is None:
        key = jax.random.PRNGKey(0)
    angles = jax.random.uniform(key, magnitudes.shape, minval=-np.pi,
                                maxval=np.pi)
    signal = stft_inverse(magnitudes, angles)
    for _ in range(n_iters):
        spec = stft_forward(signal)
        angles = jnp.angle(spec)
        signal = stft_inverse(magnitudes, angles)
    return signal


# ---------------------------------------------------------------------------
# pure-numpy host path (complex FFT ops are unavailable on some TPU
# runtimes; the fallback vocoder is host-side work anyway)
# ---------------------------------------------------------------------------

def istft_numpy(magnitude, phase, filter_length=1024, hop_length=256,
                win_length=1024):
    """(n_bins, n_frames) mag/phase -> (T,) waveform, numpy end to end."""
    from flowtron_tpu.audio.stft import hann_window, pad_center

    window = pad_center(hann_window(win_length).astype(np.float64),
                        filter_length)
    spec = magnitude.astype(np.float64) * np.exp(1j * phase.astype(np.float64))
    frames = np.fft.irfft(spec.T, n=filter_length, axis=-1) * window[None, :]

    n_frames = frames.shape[0]
    n = filter_length + hop_length * (n_frames - 1)
    out = np.zeros(n)
    for i in range(n_frames):
        out[i * hop_length:i * hop_length + filter_length] += frames[i]

    wss = window_sumsquare(win_length, filter_length, hop_length, n_frames)
    tiny = np.finfo(np.float32).tiny
    out = out / np.where(wss > tiny, wss, 1.0)
    pad = filter_length // 2
    return out[pad:-pad].astype(np.float32)


def griffin_lim_numpy(magnitudes, filter_length=1024, hop_length=256,
                      win_length=1024, n_iters=30, seed=0):
    """(n_bins, n_frames) magnitudes -> (T,) waveform, numpy end to end."""
    from flowtron_tpu.audio.stft import hann_window, pad_center

    window = pad_center(hann_window(win_length).astype(np.float64),
                        filter_length)
    rng = np.random.default_rng(seed)
    angles = rng.uniform(-np.pi, np.pi, magnitudes.shape)

    def forward(signal):
        pad = filter_length // 2
        # reflect needs pad < len(signal); ultra-short synthesis (a gate
        # that fires within the first frames) falls back to zero padding
        mode = "reflect" if signal.size > pad else "constant"
        x = np.pad(signal.astype(np.float64), pad, mode=mode)
        n_frames = magnitudes.shape[1]
        frames = np.stack([
            x[i * hop_length:i * hop_length + filter_length]
            for i in range(n_frames)
        ])
        return np.fft.rfft(frames * window[None, :], axis=-1).T

    signal = istft_numpy(magnitudes, angles, filter_length, hop_length,
                         win_length)
    for _ in range(n_iters):
        spec = forward(signal)
        angles = np.angle(spec)
        signal = istft_numpy(magnitudes, angles, filter_length, hop_length,
                             win_length)
    return signal
