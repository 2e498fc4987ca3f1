"""Tone-CER: the synthetic intelligibility metric (data/tone_cer.py).

The reference's final quality gate is perceptual — synthesize and
listen (reference:README.md:27-40). The coded-tone corpus makes that
check exact in-container: every character is a unique tone, so audio
can be decoded back to text and scored by character error rate. These
tests pin the decoder's two ends: ground-truth corpus audio decodes
with CER ~ 0 (through the mel front-end AND the full Griffin-Lim audio
chain), and an untrained model / mismatched content scores near the
chance floor — so a falling CER during training can only mean the
model synthesizes the requested content.
"""

import numpy as np
import pytest
import jax

from flowtron_tpu.data.synth import random_text, synth_utterance
from flowtron_tpu.data.tone_cer import (cer, char_templates, decode_audio,
                                        decode_mel, levenshtein,
                                        templates_from_config,
                                        transcribe_model)

DC = {"sampling_rate": 22050, "filter_length": 1024, "hop_length": 256,
      "win_length": 1024, "mel_fmin": 0.0, "mel_fmax": 8000.0}


def _mel(wave):
    from flowtron_tpu.audio.stft import MelSpectrogram
    msp = MelSpectrogram(1024, 256, 1024, 80, 22050, 0.0, 8000.0)
    return msp.mel_numpy(np.asarray(wave, np.float32))


class TestLevenshteinCer:
    def test_known_distances(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("abc", "") == 3
        assert levenshtein("same", "same") == 0

    def test_cer_normalizes_by_reference(self):
        assert cer("ab", "abcd") == 0.5
        assert cer("abcdefgh", "abcd") == 1.0  # insertions can reach >= 1
        assert cer("", "") == 0.0


class TestTemplates:
    def test_shape_and_norm(self):
        T = char_templates()
        assert T.shape == (26, 80)
        np.testing.assert_allclose(np.linalg.norm(T, axis=1), 1.0,
                                   atol=1e-9)

    def test_templates_discriminate(self):
        """Every letter pair must be separable by cosine similarity —
        the property the corpus was designed for (data/synth.py
        docstring) and the one the decoder relies on."""
        T = char_templates()
        S = T @ T.T - 2 * np.eye(26)
        assert S.max() < 0.95

    def test_pitch_shift_moves_templates(self):
        a = char_templates(pitch_shift=1.0)
        b = char_templates(pitch_shift=2.0 ** 0.5)
        assert np.abs(a - b).max() > 0.1

    def test_cache_hit(self):
        assert char_templates() is char_templates()


class TestGroundTruthDecode:
    """Corpus audio must decode back to its own transcript."""

    def test_mel_decode_is_exact(self):
        rng = np.random.default_rng(7)
        T = char_templates()
        cers = []
        for _ in range(10):
            text = random_text(rng)
            wave, _ = synth_utterance(text, seed=int(rng.integers(2**31)))
            cers.append(cer(decode_mel(_mel(wave), T), text))
        assert np.mean(cers) < 0.02

    def test_audio_decode_is_exact(self):
        text = "bado kife nemu"
        wave, _ = synth_utterance(text, seed=5)
        assert decode_audio(wave, DC) == text

    def test_griffinlim_chain_decodes(self):
        """mel -> pinv mel inversion -> Griffin-Lim -> waveform ->
        STFT -> characters: the full audio chain the metric reports."""
        jax.config.update("jax_platforms", "cpu")
        from flowtron_tpu.infer.sampling import mel_to_audio_griffinlim
        text = "gane ru domi"
        wave, _ = synth_utterance(text, seed=9)
        audio = np.asarray(
            mel_to_audio_griffinlim(_mel(wave), DC, n_iters=30)).reshape(-1)
        assert cer(decode_audio(audio, DC), text) < 0.05

    def test_pitch_shifted_speaker_needs_matching_templates(self):
        """Speaker 4's audio (f0 x 2^0.5) decodes cleanly with its own
        templates and badly with speaker 0's — the per-speaker shift is
        real signal, not a no-op."""
        text = "bozu mela ki"
        shift = 2.0 ** (4 / 8.0)
        wave, _ = synth_utterance(text, seed=3, pitch_shift=shift)
        right = decode_audio(wave, DC, pitch_shift=shift)
        wrong = decode_audio(wave, DC, pitch_shift=1.0)
        assert cer(right, text) < 0.1
        assert cer(wrong, text) > 0.5


class TestChanceFloor:
    def test_random_mel_scores_near_total_error(self):
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((80, 200)) - 6.0
        hyp = decode_mel(mel, char_templates())
        assert cer(hyp, "bado kife nemu lota") > 0.6

    def test_wrong_text_scores_high(self):
        wave, _ = synth_utterance("bado kife nemu", seed=5)
        assert cer(decode_audio(wave, DC), "zugo pativa re") > 0.6

    def test_empty_mel(self):
        assert decode_mel(np.zeros((80, 0)), char_templates()) == ""


class TestUntrainedModel:
    def test_untrained_model_is_unintelligible(self):
        """An untrained Flowtron's synthesis must score near the chance
        floor — the metric cannot be satisfied by alignment alone."""
        from flowtron_tpu.models import flowtron_init
        params, static_cfg = flowtron_init(
            jax.random.PRNGKey(0), n_flows=1, use_gate_layer=True,
            n_speakers=1, n_speaker_dim=4, n_text=185, n_text_dim=16,
            n_mel_channels=80, n_hidden=12, n_attn_channels=8,
            n_lstm_layers=2)
        config = {"data_config": dict(DC), "train_config": {"sigma": 0.5}}
        rows = transcribe_model(params, static_cfg, config,
                                [("bado kife nemu", 0)], n_frames=96,
                                via_audio=False, seed=11)
        assert rows[0]["cer_mel"] > 0.5


class TestEvaluateIntegration:
    def test_evaluate_reports_tone_cer(self, tmp_path):
        """evaluate(..., tone_cer_texts=N) on a coded-tone corpus
        returns the metric keys; an untrained checkpoint sits near the
        chance floor."""
        from flowtron_tpu.config import load_config
        from flowtron_tpu.data.synth import make_aligned_corpus
        from flowtron_tpu.models import flowtron_init
        from flowtron_tpu.train.checkpoints import save_checkpoint
        from flowtron_tpu.train.radam import radam

        train_fl, val_fl = make_aligned_corpus(
            str(tmp_path), n_utterances=4, n_speakers=1, val_count=2,
            seed=0)
        small = dict(n_speakers=1, n_speaker_dim=4, n_text=185,
                     n_text_dim=16, n_mel_channels=80, n_hidden=12,
                     n_attn_channels=8, n_lstm_layers=2, n_flows=1,
                     use_gate_layer=True)
        params, _ = flowtron_init(jax.random.PRNGKey(0), **small)
        ckpt = str(tmp_path / "model")
        save_checkpoint(ckpt, params, radam(1e-3).init(params), 0, 1e-3)
        config = load_config(overrides=[
            f"data_config.training_files={train_fl}",
            f"data_config.validation_files={val_fl}",
            "data_config.p_arpabet=0.0",
            "data_config.cmudict_path=",
            "data_config.heteronyms_path=",
            "data_config.use_attn_prior=False",
            "train_config.batch_size=2",
        ])
        config["model_config"] = small

        from flowtron_tpu.train.evaluate import evaluate
        result = evaluate(config, ckpt, invertibility_frames=0,
                          tone_cer_texts=2)
        assert 0.0 <= result["tone_cer_mel"]
        assert result["tone_cer"] > 0.5  # untrained = unintelligible


class TestTrainingValidationIntegration:
    @pytest.mark.slow
    def test_train_logs_tone_cer_scalar(self, tmp_path, capsys):
        """train_config.tone_cer_validation_texts>0: the training loop
        decodes free-running synthesis every validation and reports
        validation/tone_cer_mel (the reference's listen-during-training
        workflow as a live scalar)."""
        from flowtron_tpu.config import load_config
        from flowtron_tpu.data.synth import make_aligned_corpus
        from flowtron_tpu.train.loop import train

        train_fl, val_fl = make_aligned_corpus(
            str(tmp_path), n_utterances=18, n_speakers=1, val_count=2,
            seed=0)
        config = load_config(overrides=[
            f"data_config.training_files={train_fl}",
            f"data_config.validation_files={val_fl}",
            "data_config.p_arpabet=0.0",
            "data_config.cmudict_path=",
            "data_config.heteronyms_path=",
            "data_config.use_attn_prior=False",
            f"data_config.prior_cache_path={tmp_path}/prior",
            "model_config.n_flows=1", "model_config.n_speakers=1",
            "model_config.n_text_dim=16", "model_config.n_hidden=12",
            "model_config.n_attn_channels=8",
            "model_config.n_speaker_dim=4",
            "model_config.mel_encoder_n_hidden=8",
            "train_config.batch_size=1", "train_config.epochs=1",
            "train_config.iters_per_checkpoint=1",
            "train_config.with_tensorboard=False",
            "train_config.tone_cer_validation_texts=2",
            f"train_config.output_directory={tmp_path}/out",
        ])
        train(config)
        out = capsys.readouterr().out
        line = [ln for ln in out.splitlines()
                if "Validation tone-CER(mel)" in ln]
        assert line, out[-2000:]
        val = float(line[0].rsplit(" ", 1)[1])
        assert 0.0 <= val <= 3.0 and np.isfinite(val)
