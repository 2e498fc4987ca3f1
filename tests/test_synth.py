"""The alignment-learnable synthetic corpus (data/synth.py): ground
truth for the quality-proxy metrics. Unlike the earlier tonal smoke
corpora, its audio monotonically encodes the character sequence, so a
model trained on it CAN learn the diagonal attention the reference
trains toward (reference:README.md:37-40) — and these tests pin that
the corpus's oracle alignment actually scores as diagonal/monotone
under the same metrics used on trained checkpoints."""

import numpy as np
import pytest

from flowtron_tpu.data.synth import (make_aligned_corpus,
                                     oracle_attention, random_text,
                                     synth_utterance)
from flowtron_tpu.train.evaluate import (attention_diagonality,
                                         attention_monotonicity)


class TestSynthUtterance:
    def test_spans_cover_waveform_exactly(self):
        wave, spans = synth_utterance("bado ki", seed=3)
        assert spans[0][1] == 0
        for (_, s0, e0), (_, s1, _) in zip(spans, spans[1:]):
            assert e0 == s1
        assert spans[-1][2] == len(wave)
        assert len(spans) == len("bado ki")

    def test_deterministic_in_seed(self):
        a, _ = synth_utterance("muna se", seed=7)
        b, _ = synth_utterance("muna se", seed=7)
        c, _ = synth_utterance("muna se", seed=8)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_distinct_chars_are_spectrally_distinct(self):
        """Different letters must be separable in the mel domain —
        otherwise the alignment is unlearnable. Compare mean log-mel
        vectors of two single-char utterances."""
        import jax
        jax.config.update("jax_platforms", "cpu")
        from flowtron_tpu.audio import MelSpectrogram
        mel_fn = MelSpectrogram()
        mels = []
        for ch in ("b", "z"):
            wave, _ = synth_utterance(ch, seed=1, char_ms=(200, 200))
            m = np.asarray(mel_fn(np.asarray(wave)[None, :]))[0]
            mels.append(m.mean(axis=1))
        assert np.abs(mels[0] - mels[1]).max() > 1.0

    def test_pitch_shift_changes_audio(self):
        a, _ = synth_utterance("dane", seed=5, pitch_shift=1.0)
        b, _ = synth_utterance("dane", seed=5, pitch_shift=1.5)
        assert not np.array_equal(a, b)


class TestOracleAlignment:
    """The corpus's ground-truth alignment must score near-perfect on
    the very metrics evaluate() reports, and uniform attention must
    not — i.e. the metrics can actually witness alignment learning on
    this corpus."""

    def _oracle_batch(self, seed=11):
        text = random_text(np.random.default_rng(seed))
        wave, spans = synth_utterance(text, seed=seed)
        n_frames = len(wave) // 256 + 1
        A = oracle_attention(spans, n_frames)
        return A[None], np.array([n_frames]), np.array([len(spans)])

    def test_oracle_is_diagonal_and_monotone(self):
        A, out_lens, in_lens = self._oracle_batch()
        assert attention_diagonality(A, out_lens, in_lens) > 0.85
        assert attention_monotonicity(A, out_lens, in_lens) > 0.99

    def test_uniform_attention_scores_low(self):
        A, out_lens, in_lens = self._oracle_batch()
        U = np.ones_like(A) / A.shape[-1]
        assert attention_diagonality(U, out_lens, in_lens) < 0.45

    def test_oracle_rows_are_onehot_in_text_order(self):
        A, out_lens, in_lens = self._oracle_batch(seed=4)
        a = A[0]
        np.testing.assert_allclose(a.sum(-1), 1.0)
        ks = a.argmax(-1)
        assert (np.diff(ks) >= 0).all()
        assert ks[0] == 0 and ks[-1] == in_lens[0] - 1


class TestMakeAlignedCorpus:
    def test_filelist_and_text_roundtrip(self, tmp_path):
        """Every transcript survives the frontend unchanged (1 symbol
        per character at p_arpabet=0), so text length == alignment
        length — the property the on-device alignment experiment and
        oracle_attention rely on."""
        from flowtron_tpu.text import _clean_text, text_to_sequence
        train_fl, val_fl = make_aligned_corpus(
            str(tmp_path), n_utterances=6, n_speakers=2, val_count=2)
        lines = (open(train_fl).read().strip().split("\n")
                 + open(val_fl).read().strip().split("\n"))
        assert len(lines) == 6
        sids = set()
        for line in lines:
            path, text, sid = line.split("|")
            sids.add(int(sid))
            cleaned = _clean_text(text, ["flowtron_cleaners"])
            assert cleaned == text
            assert len(text_to_sequence(cleaned)) == len(text)
            from scipy.io import wavfile
            sr, wav = wavfile.read(path)
            assert sr == 22050 and wav.dtype == np.int16
            assert len(wav) > sr // 4
        assert sids == {0, 1}

    def test_deterministic(self, tmp_path):
        fl1, _ = make_aligned_corpus(str(tmp_path / "a"), n_utterances=3,
                                     seed=9)
        fl2, _ = make_aligned_corpus(str(tmp_path / "b"), n_utterances=3,
                                     seed=9)
        t1 = [ln.split("|", 1)[1] for ln in open(fl1)]
        t2 = [ln.split("|", 1)[1] for ln in open(fl2)]
        assert t1 == t2

    def test_loads_through_data_pipeline(self, tmp_path):
        """The corpus feeds the real Data loader: mel + text ids +
        prior come out with consistent shapes."""
        import jax
        jax.config.update("jax_platforms", "cpu")
        from flowtron_tpu.data.dataset import Data
        train_fl, _ = make_aligned_corpus(str(tmp_path), n_utterances=3)
        data = Data(train_fl, text_cleaners=["flowtron_cleaners"],
                    p_arpabet=0.0, use_attn_prior=True,
                    prior_cache_path=str(tmp_path / "prior"))
        mel, sid, ids, prior = data[0]
        assert mel.shape[0] == 80
        assert prior.shape == (mel.shape[1], len(ids))
