"""Dataset: filelist -> (mel, speaker_id, text ids, attention prior).

Behavior-parity with reference:data.py:59-188: pipe-separated filelists
``wav_path|transcript|speaker_id``, dense speaker lookup over sorted unique
ids, per-word ARPAbet substitution with probability ``p_arpabet``, prior
disk cache enabled only at p_arpabet == 1.0, sampling-rate check.

Host-side numpy end to end (no device round-trips per utterance); batching
happens in collate.py.
"""

import os
import random
import re

import numpy as np
from scipy.io import wavfile

from flowtron_tpu.audio import MelSpectrogram
from flowtron_tpu.data.prior import beta_binomial_prior
from flowtron_tpu.text import (
    text_to_sequence, _clean_text, get_arpabet, set_heteronyms_path,
)
from flowtron_tpu.text.cmudict import CMUDict
from flowtron_tpu.text import cleaners as _cleaners_mod


def _atomic_save_npy(path, arr):
    """Write-then-rename so concurrent readers (multi-host loaders
    sharing a cache dir) never observe a half-written file. The tmp
    suffix includes a uuid, not just the pid — pids are per-host and
    can collide between hosts sharing the dir."""
    import uuid
    tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp.npy"
    with open(tmp, "wb") as f:
        np.save(f, arr)
    os.replace(tmp, path)


def _load_cached_npy(path):
    """None on miss — or on a corrupt/partial file (pre-atomic-writer
    caches), which is recomputed rather than crashing the loader."""
    if not os.path.exists(path):
        return None
    try:
        return np.load(path)
    except (ValueError, EOFError, OSError):
        return None


def load_filepaths_and_text(filelist, split="|"):
    if isinstance(filelist, str):
        with open(filelist, encoding="utf-8") as f:
            return [line.strip().split(split) for line in f]
    return filelist


def load_wav(full_path):
    """Returns (float32 waveform in native integer scale, sampling_rate)."""
    sampling_rate, data = wavfile.read(full_path)
    return data.astype(np.float32), sampling_rate


# data_config keys consumed by other layers, not Data.__init__
_NON_DATA_KEYS = frozenset({
    "training_files", "validation_files",     # filelist selection
    "use_grain", "grain_workers",             # loader (train/loop.py)
})


def data_kwargs(data_config, exclude=("training_files", "validation_files")):
    """Filter a data_config dict down to Data.__init__'s parameters.

    The config section may carry loader-level keys (use_grain,
    grain_workers) that the frontends constructing a bare Data (serve,
    inference, style transfer, mel dump) must not forward. Anything
    that is neither a Data parameter nor a known loader key is a typo
    and raises (silently dropping `hop_lenght=512` would hand the user
    wrong-resolution mels with no error).
    """
    import inspect
    valid = set(inspect.signature(Data.__init__).parameters)
    valid -= {"self", "filelist_path"}
    unknown = set(data_config) - valid - _NON_DATA_KEYS
    if unknown:
        raise TypeError(
            f"unknown data_config key(s): {sorted(unknown)} — not a "
            f"Data parameter or loader option")
    return {k: v for k, v in data_config.items()
            if k in valid and k not in exclude}


class Data:
    """Map-style dataset over a filelist."""

    def __init__(self, filelist_path, filter_length=1024, hop_length=256,
                 win_length=1024, sampling_rate=22050, mel_fmin=0.0,
                 mel_fmax=8000.0, max_wav_value=32768.0, p_arpabet=0.5,
                 cmudict_path="", heteronyms_path="", text_cleaners=None,
                 speaker_ids=None, use_attn_prior=False,
                 attn_prior_threshold=1e-4, prior_cache_path="",
                 betab_scaling_factor=1.0, randomize=True,
                 keep_ambiguous=False, seed=1234, mel_cache_path="",
                 use_native=False):
        self.max_wav_value = max_wav_value
        self.audiopaths_and_text = load_filepaths_and_text(filelist_path)
        self.use_attn_prior = use_attn_prior
        self.betab_scaling_factor = betab_scaling_factor
        self.attn_prior_threshold = attn_prior_threshold

        if speaker_ids is None or speaker_ids == "":
            self.speaker_ids = self.create_speaker_lookup_table(
                self.audiopaths_and_text)
        else:
            self.speaker_ids = speaker_ids

        self.stft = MelSpectrogram(
            filter_length=filter_length, hop_length=hop_length,
            win_length=win_length, sampling_rate=sampling_rate,
            mel_fmin=mel_fmin, mel_fmax=mel_fmax)
        self.sampling_rate = sampling_rate
        self.text_cleaners = text_cleaners or ["flowtron_cleaners"]
        self.p_arpabet = p_arpabet
        self.cmudict = (CMUDict(cmudict_path, keep_ambiguous=keep_ambiguous)
                        if cmudict_path else None)
        _cleaners_mod.set_acronym_cmudict(self.cmudict)
        if heteronyms_path:
            set_heteronyms_path(heteronyms_path)

        # prior caching only makes sense when text lengths are deterministic
        self.prior_cache_path = prior_cache_path
        self.caching_enabled = bool(prior_cache_path) and p_arpabet == 1.0
        if self.caching_enabled and not os.path.exists(prior_cache_path):
            os.makedirs(prior_cache_path)

        # optional mel disk cache (mels are deterministic per wav)
        self.mel_cache_path = mel_cache_path
        if mel_cache_path and not os.path.exists(mel_cache_path):
            os.makedirs(mel_cache_path)

        # optional native (C++) wav decode + mel path; falls back silently
        self._native_mel = None
        self._native_decode = None
        if use_native:
            try:
                from flowtron_tpu import native
                if native.available() or native.build():
                    self._native_mel = native.NativeMel(
                        np.asarray(self.stft.window),
                        np.asarray(self.stft.mel_basis),
                        filter_length, hop_length)
                    self._native_decode = native.decode_wav
            except Exception as e:  # pragma: no cover
                print(f"native data path unavailable ({e}); using numpy")

        self._rand = random.Random(seed)
        if randomize:
            self._rand.shuffle(self.audiopaths_and_text)

    def create_speaker_lookup_table(self, audiopaths_and_text):
        ids = np.sort(np.unique([x[2] for x in audiopaths_and_text]))
        table = {int(ids[i]): i for i in range(len(ids))}
        print("Number of speakers:", len(table))
        return table

    def compute_attention_prior(self, audiopath, mel_length, text_length):
        prior_path = None
        if self.caching_enabled:
            folder = audiopath.split("/")[-2] if "/" in audiopath else ""
            fname = os.path.basename(audiopath).split(".")[0]
            prior_path = os.path.join(self.prior_cache_path,
                                      f"{folder}_{fname}_prior.npy")
            cached = _load_cached_npy(prior_path)
            if cached is not None and \
                    cached.shape == (mel_length, text_length):
                if self.attn_prior_threshold > 0:
                    cached = np.where(cached < self.attn_prior_threshold,
                                      0.0, cached)
                return cached

        attn_prior = beta_binomial_prior(text_length, mel_length,
                                         self.betab_scaling_factor)
        if prior_path is not None:
            _atomic_save_npy(prior_path, attn_prior)
        if self.attn_prior_threshold > 0:
            attn_prior = np.where(attn_prior < self.attn_prior_threshold,
                                  0.0, attn_prior)
        return attn_prior

    def get_mel(self, audio):
        """audio: float32 waveform in integer scale -> (80, T) log-mel."""
        audio_norm = audio / self.max_wav_value
        if self._native_mel is not None:
            return self._native_mel(audio_norm)
        return self.stft.mel_numpy(audio_norm)

    def _load_mel_cached(self, audiopath, audio):
        if not self.mel_cache_path:
            return self.get_mel(audio)
        fname = audiopath.replace("/", "_").replace("\\", "_") + ".npy"
        path = os.path.join(self.mel_cache_path, fname)
        cached = _load_cached_npy(path)
        if cached is not None:
            return cached
        mel = self.get_mel(audio)
        _atomic_save_npy(path, mel)
        return mel

    def get_speaker_id(self, speaker_id):
        return np.int64(self.speaker_ids[int(speaker_id)])

    def get_text(self, text):
        text = _clean_text(text, self.text_cleaners)
        words = re.findall(r"\S*\{.*?\}\S*|\S+", text)
        if self.cmudict is not None:
            text = " ".join([
                get_arpabet(word, self.cmudict)
                if self._rand.random() < self.p_arpabet else word
                for word in words
            ])
        else:
            text = " ".join(words)
        return np.asarray(text_to_sequence(text), np.int64)

    def __getitem__(self, index):
        audiopath, text, speaker_id = self.audiopaths_and_text[index]
        if self._native_decode is not None:
            audio, sampling_rate = self._native_decode(audiopath)
        else:
            audio, sampling_rate = load_wav(audiopath)
        if sampling_rate != self.sampling_rate:
            raise ValueError(f"{sampling_rate} SR doesn't match target "
                             f"{self.sampling_rate} SR")

        mel = self._load_mel_cached(audiopath, audio)
        text_encoded = self.get_text(text)
        speaker_id = self.get_speaker_id(speaker_id)
        attn_prior = None
        if self.use_attn_prior:
            attn_prior = self.compute_attention_prior(
                audiopath, mel.shape[1], text_encoded.shape[0])
        return mel, speaker_id, text_encoded, attn_prior

    def __len__(self):
        return len(self.audiopaths_and_text)
