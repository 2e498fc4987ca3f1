"""Data-pipeline parity against the reference's ACTUAL code.

test_reference_parity.py closes the hand-written-oracle hole for the
MODEL (it executes /root/reference/flowtron.py). This module does the
same for the DATA path: it imports the reference's real
``audio_processing.py`` (conv1d-DFT STFT + TacotronSTFT,
reference:audio_processing.py:96-230) and ``data.py`` (Data /
DataCollate / beta_binomial_prior_distribution,
reference:data.py:30-246) and compares their outputs item-for-item
with ours on the same wav corpus.

Two container-absent libraries are shimmed, and ONLY those:

* ``librosa`` — the reference needs ``filters.mel`` plus
  ``util.pad_center``/``tiny``/``normalize``. The filterbank shim is
  our ``audio/mel.py:mel_filterbank``, which is independently pinned
  against the slaney formula in test_audio, so mel-basis parity is
  established there, not assumed here.
* ``text`` — the reference's text package imports inflect/unidecode
  (absent). The shim maps to our ``flowtron_tpu.text``; text-frontend
  parity has its own golden/fuzz suites (test_text, test_text_fuzz).
  What THIS module adds on top is the reference's actual coin-flip /
  word-split / sequencing driver code in ``Data.get_text``
  (reference:data.py:157-164).

Everything else runs the reference's genuine code: scipy betabinom
prior, wav loading + normalization, the conv1d STFT, mel matmul,
log-clamp, speaker table, filelist shuffling, and collate
padding/sorting/gate-target construction.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

from flowtron_tpu.audio.mel import mel_filterbank
from flowtron_tpu.data.collate import DataCollate
from flowtron_tpu.data.dataset import Data
from flowtron_tpu.data.prior import beta_binomial_prior
from flowtron_tpu.data.synth import make_aligned_corpus

REF_AUDIO = "/root/reference/audio_processing.py"
REF_DATA = "/root/reference/data.py"
CMUDICT = os.path.join(os.path.dirname(__file__), "..",
                       "data", "cmudict_dictionary")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_AUDIO) and os.path.exists(REF_DATA)),
    reason="reference checkout not available")


def _fake_librosa():
    """librosa facade: filterbank from our pinned slaney implementation,
    plus the three trivial util helpers the reference touches."""
    util = types.ModuleType("librosa.util")

    def pad_center(data, size, **kw):
        n = len(data)
        lpad = (size - n) // 2
        return np.pad(data, (lpad, size - n - lpad))

    def tiny(x):
        return np.finfo(np.asarray(x).dtype).tiny

    def normalize(S, norm=np.inf, axis=0, **kw):
        if norm is None:
            return S
        mag = np.abs(S).astype(float)
        if norm == np.inf:
            length = mag.max(axis=axis, keepdims=True)
        else:
            length = (mag ** norm).sum(axis=axis, keepdims=True) \
                ** (1.0 / norm)
        length[length < tiny(mag)] = 1.0
        return S / length

    util.pad_center, util.tiny, util.normalize = \
        pad_center, tiny, normalize

    filters = types.ModuleType("librosa.filters")
    filters.mel = (lambda sr, n_fft, n_mels=128, fmin=0.0, fmax=None:
                   mel_filterbank(sr, n_fft, n_mels, fmin, fmax))

    librosa = types.ModuleType("librosa")
    librosa.util, librosa.filters = util, filters
    return {"librosa": librosa, "librosa.util": util,
            "librosa.filters": filters}


def _fake_text():
    """Back the reference's `text` package imports with our frontend."""
    from flowtron_tpu.text import text_to_sequence, _clean_text, \
        get_arpabet
    from flowtron_tpu.text import cmudict as our_cmudict
    text = types.ModuleType("text")
    text.text_to_sequence = text_to_sequence
    text._clean_text = _clean_text
    text.get_arpabet = get_arpabet
    text.cmudict = our_cmudict
    return {"text": text}


@pytest.fixture(scope="module")
def refdata():
    """Load reference audio_processing.py + data.py with the shims."""
    inject = {}
    inject.update(_fake_librosa())
    inject.update(_fake_text())
    saved = {k: sys.modules.get(k) for k in
             list(inject) + ["audio_processing", "reference_data"]}
    sys.modules.update(inject)
    try:
        spec = importlib.util.spec_from_file_location(
            "audio_processing", REF_AUDIO)
        audio_mod = importlib.util.module_from_spec(spec)
        sys.modules["audio_processing"] = audio_mod
        spec.loader.exec_module(audio_mod)

        spec = importlib.util.spec_from_file_location(
            "reference_data", REF_DATA)
        data_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(data_mod)
        yield data_mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("refdata_corpus")
    train_fl, _ = make_aligned_corpus(str(root), n_utterances=6,
                                      n_speakers=2, seed=3)
    return train_fl


_DATA_KW = dict(filter_length=1024, hop_length=256, win_length=1024,
                sampling_rate=22050, mel_fmin=0.0, mel_fmax=8000.0,
                max_wav_value=32768.0, p_arpabet=0.0,
                cmudict_path=CMUDICT,
                text_cleaners=["flowtron_cleaners"],
                use_attn_prior=True, attn_prior_threshold=1e-4,
                randomize=False, seed=1234)


def _build_pair(refdata, corpus, **overrides):
    kw = dict(_DATA_KW, **overrides)
    theirs = refdata.Data(corpus, **kw)
    ours = Data(corpus, **kw)
    return theirs, ours


class TestDataItemParity:
    def test_items(self, refdata, corpus):
        theirs, ours = _build_pair(refdata, corpus)
        assert len(theirs) == len(ours) == 6
        for i in range(len(ours)):
            mel_r, sid_r, text_r, prior_r = theirs[i]
            mel_o, sid_o, text_o, prior_o = ours[i]
            # text ids + speaker id: exact
            np.testing.assert_array_equal(np.asarray(text_o),
                                          text_r.numpy())
            assert int(sid_o) == int(sid_r.item())
            # log-mel: the reference's conv1d-DFT STFT vs our framed
            # rfft, fp32; identical window, mel basis, log-clamp
            assert mel_o.shape == tuple(mel_r.shape)
            np.testing.assert_allclose(np.asarray(mel_o), mel_r.numpy(),
                                       atol=2e-3)
            # beta-binomial prior incl. the threshold mask
            np.testing.assert_allclose(np.asarray(prior_o),
                                       prior_r.numpy(), atol=1e-6)

    def test_speaker_table(self, refdata, corpus):
        theirs, ours = _build_pair(refdata, corpus)
        assert theirs.speaker_ids == ours.speaker_ids

    def test_shuffle_order(self, refdata, corpus):
        """randomize=True: same seed -> same filelist permutation
        (reference:data.py:106-108 uses the stdlib Mersenne shuffle,
        as do we — iteration order is training-relevant parity)."""
        theirs, ours = _build_pair(refdata, corpus, randomize=True)
        assert theirs.audiopaths_and_text == \
            [list(x) for x in ours.audiopaths_and_text] or \
            theirs.audiopaths_and_text == ours.audiopaths_and_text


class TestPriorFunctionParity:
    def test_beta_binomial(self, refdata):
        for P, M, scale in ((7, 11, 1.0), (23, 57, 1.0), (15, 40, 0.5)):
            ref = refdata.beta_binomial_prior_distribution(
                P, M, scaling_factor=scale).numpy()
            ours = beta_binomial_prior(P, M, scaling_factor=scale)
            assert ours.shape == ref.shape == (M, P)
            np.testing.assert_allclose(ours, ref, atol=1e-8)


class TestCollateParity:
    def test_collate(self, refdata, corpus):
        theirs, ours = _build_pair(refdata, corpus)
        # distinct text lengths -> unambiguous sort order either side
        items, seen = [], set()
        for i in range(len(ours)):
            it = ours[i]
            if len(it[2]) not in seen:
                seen.add(len(it[2]))
                items.append(it)
        assert len(items) >= 3
        torch_items = [
            (torch.from_numpy(np.asarray(m)).float(),
             torch.LongTensor([int(s)]),
             torch.from_numpy(np.asarray(t)).long(),
             torch.from_numpy(np.asarray(p)).float())
            for m, s, t, p in items]

        ref_out = refdata.DataCollate(use_attn_prior=True)(torch_items)
        our_out = DataCollate(use_attn_prior=True)(items)
        (mel_r, sid_r, text_r, in_r, out_r, gate_r, prior_r) = ref_out

        np.testing.assert_allclose(our_out["mel"], mel_r.numpy(),
                                   atol=0)
        np.testing.assert_array_equal(our_out["speaker_ids"],
                                      sid_r.numpy())
        np.testing.assert_array_equal(our_out["text"], text_r.numpy())
        np.testing.assert_array_equal(our_out["in_lens"], in_r.numpy())
        np.testing.assert_array_equal(our_out["out_lens"],
                                      out_r.numpy())
        np.testing.assert_array_equal(our_out["gate_target"],
                                      gate_r.numpy())
        np.testing.assert_allclose(our_out["attn_prior"],
                                   prior_r.numpy(), atol=0)
