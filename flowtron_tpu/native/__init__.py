"""ctypes bindings for the native (C++) data-pipeline kernels.

``NativeMel`` mirrors MelSpectrogram.mel_numpy bit-for-bit (same window and
mel basis arrays, same framing); ``decode_wav`` parses PCM16 WAVs without
scipy. Both are optional: ``available()`` is False until
``flowtron_tpu/native/build.sh`` has produced libflowtron_native.so, and
callers fall back to the numpy path.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libflowtron_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mel_create.restype = ctypes.c_void_p
    lib.mel_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.mel_destroy.argtypes = [ctypes.c_void_p]
    lib.mel_compute.restype = ctypes.c_int
    lib.mel_compute.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.wav_decode_pcm16.restype = ctypes.c_int64
    lib.wav_decode_pcm16.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def build(verbose=False):
    """Compile the shared library (g++) in place."""
    script = os.path.join(os.path.dirname(__file__), "build.sh")
    subprocess.run(["sh", script], check=True,
                   capture_output=not verbose)
    global _lib
    _lib = None
    return _load() is not None


def available():
    return _load() is not None


def _f32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeMel:
    """waveform (float32, [-1,1]) -> (n_mels, n_frames) log-mel, in C++."""

    def __init__(self, window, mel_basis, filter_length=1024,
                 hop_length=256, clip_val=1e-5, n_threads=0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built; run "
                               "flowtron_tpu/native/build.sh")
        self._lib = lib
        self.filter_length = filter_length
        self.hop_length = hop_length
        window = np.ascontiguousarray(window, np.float32)
        mel_basis = np.ascontiguousarray(mel_basis, np.float32)
        self.n_mels = mel_basis.shape[0]
        self.n_threads = n_threads or (os.cpu_count() or 1)
        self._handle = lib.mel_create(
            filter_length, hop_length, self.n_mels, ctypes.c_float(clip_val),
            _f32ptr(window), _f32ptr(mel_basis))

    def __call__(self, audio):
        audio = np.ascontiguousarray(audio, np.float32)
        n_frames = len(audio) // self.hop_length + 1
        out = np.empty((self.n_mels, n_frames), np.float32)
        got = self._lib.mel_compute(self._handle, _f32ptr(audio),
                                    len(audio), _f32ptr(out),
                                    self.n_threads)
        assert got == n_frames
        return out

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.mel_destroy(self._handle)
            self._handle = None


def decode_wav(path):
    """PCM16 WAV -> (float32 samples in integer scale, sampling_rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    raw = np.fromfile(path, np.uint8)
    max_samples = len(raw) // 2
    out = np.empty(max_samples, np.float32)
    sr = ctypes.c_int(0)
    n = lib.wav_decode_pcm16(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(raw),
        _f32ptr(out), max_samples, ctypes.byref(sr))
    if n < 0:
        raise ValueError(f"unsupported wav format: {path}")
    return out[:n].copy(), sr.value
