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
        self.win_length = win_length
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


class StreamingDenoiser:
    """Chunked denoise that emits exactly the offline Denoiser's samples.

    An output sample depends only on the STFT frames overlapping it, i.e.
    on input within ``filter_length`` samples of it (plus the reflect head
    padding, fixed after the first chunk, and the reflect tail padding,
    known only at the end). Frames are spectrally subtracted as soon as
    their full support has arrived, accumulated into overlap-add and
    window-sumsquare buffers, and a sample is emitted once every frame
    overlapping it is in — so the concatenation of all ``feed()`` outputs
    plus ``flush()`` equals ``Denoiser()(full_audio)`` up to
    float32-vs-float64 rounding. The live edge therefore lags the input
    by at most ``filter_length`` samples (~46 ms at 22.05 kHz).

    Runs host-side in numpy: chunks are a few thousand samples and a
    per-chunk device dispatch would dominate the stream cadence on a
    remote TPU (the batch path keeps the jitted on-device Denoiser).
    """

    def __init__(self, denoiser, strength=0.1):
        self._fl = denoiser.filter_length
        self._hop = denoiser.hop_length
        self._pad = self._fl // 2
        self._win = np.asarray(denoiser._ms.window, np.float64)
        self._win_sq = self._win ** 2
        self._bias = np.asarray(denoiser.bias_spec, np.float64)[0, :, 0]
        self._strength = float(strength)
        self._audio = np.zeros(0, np.float64)
        self._next_frame = 0
        self._ola = np.zeros(0, np.float64)
        self._wss = np.zeros(0, np.float64)
        self._emit_p = self._pad  # next padded coordinate to emit

    def feed(self, chunk):
        """Append samples; return newly-finalized denoised samples."""
        chunk = np.asarray(chunk, np.float64).reshape(-1)
        if chunk.size:
            self._audio = np.concatenate([self._audio, chunk])
        return self._advance(last=False)

    def flush(self):
        """End of stream: emit the remaining tail and reset."""
        out = self._advance(last=True)
        self._audio = np.zeros(0, np.float64)
        self._next_frame = 0
        self._ola = np.zeros(0, np.float64)
        self._wss = np.zeros(0, np.float64)
        self._emit_p = self._pad
        return out

    def _advance(self, last):
        n, pad, hop, fl = len(self._audio), self._pad, self._hop, self._fl
        if n == 0:
            return np.zeros(0, np.float32)
        # reflect padding (the offline convention) needs > pad samples
        mode = "reflect" if n > pad else "constant"
        if last:
            x = np.pad(self._audio, pad, mode=mode)
            nf = n // hop + 1
            need = nf * hop + (fl - hop)
            if len(x) < need:  # offline _frame_signal zero-pads the tail
                x = np.pad(x, (0, need - len(x)))
            hi = nf
        else:
            if n <= pad:
                return np.zeros(0, np.float32)
            x = np.pad(self._audio, (pad, 0), mode="reflect")
            # frames whose support is fully inside the received samples
            # (anything further would read the yet-unknown tail padding)
            hi = (n + pad - fl) // hop + 1
        lo = self._next_frame
        if hi > lo:
            idx = (np.arange(lo, hi)[:, None] * hop
                   + np.arange(fl)[None, :])
            spec = np.fft.rfft(x[idx] * self._win[None, :], axis=-1)
            mag = np.clip(np.abs(spec)
                          - self._strength * self._bias[None, :],
                          0.0, None)
            rec = np.fft.irfft(mag * np.exp(1j * np.angle(spec)), n=fl,
                               axis=-1) * self._win[None, :]
            end = (hi - 1) * hop + fl
            if len(self._ola) < end:
                grow = end - len(self._ola)
                self._ola = np.pad(self._ola, (0, grow))
                self._wss = np.pad(self._wss, (0, grow))
            for k, i in enumerate(range(lo, hi)):
                self._ola[i * hop:i * hop + fl] += rec[k]
                self._wss[i * hop:i * hop + fl] += self._win_sq
            self._next_frame = hi
        if last:
            # offline trims filter_length//2 from both ends
            total = fl + hop * (self._next_frame - 1)
            emit_to = max(self._emit_p, total - pad)
        else:
            # padded coord p is final once every overlapping frame
            # (i*hop <= p < i*hop+fl) has been accumulated
            emit_to = self._next_frame * hop
        emit_to = min(emit_to, len(self._ola))
        if emit_to <= self._emit_p:
            return np.zeros(0, np.float32)
        seg = slice(self._emit_p, emit_to)
        tiny = np.finfo(np.float32).tiny
        norm = np.where(self._wss[seg] > tiny, self._wss[seg], 1.0)
        out = (self._ola[seg] / norm).astype(np.float32)
        self._emit_p = emit_to
        return out
