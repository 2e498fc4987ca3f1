"""Synthetic intelligibility metric: tone-CER.

The reference's final quality check is perceptual — synthesize and
listen (reference:README.md:27-40). No recorded speech or human ears
ship in this container, but the coded-tone corpus (data/synth.py) gives
every character a unique (f0, harmonic-signature) tone, so the check
can be made exact: STFT the synthesized audio, classify each frame
against the 26 per-character tone templates (+ silence), run-length
collapse the frame labels back into a string, and report the character
error rate against the requested text. A model that aligns but renders
the wrong tones scores near the ~1.0 chance floor; a model that
synthesizes the requested content scores near 0.

The decode path exercises the full production chain the reference's
recipe covers with ears: text -> Flowtron infer -> mel -> vocoder
(Griffin-Lim mel inversion) -> waveform -> STFT -> characters.

All functions are pure numpy (host-side); only ``transcribe_model``
touches the accelerator (through ``infer.sampling.synthesize``).
"""

import numpy as np

_TEMPLATE_CACHE = {}


def char_templates(filter_length=1024, hop_length=256, win_length=1024,
                   sampling_rate=22050, mel_fmin=0.0, mel_fmax=8000.0,
                   pitch_shift=1.0, n_mel_channels=80):
    """L2-normalized linear-mel templates, one row per letter a-z.

    Each template is the mean linear-power mel frame of a clean steady
    rendering of that character's tone (data/synth.py:_char_timbre) —
    the matched filter the corpus was designed to make possible.
    `pitch_shift` must match the speaker's shift (2**(sid/8) in
    make_aligned_corpus).
    """
    key = (filter_length, hop_length, win_length, sampling_rate,
           mel_fmin, mel_fmax, round(float(pitch_shift), 9),
           n_mel_channels)
    if key in _TEMPLATE_CACHE:
        return _TEMPLATE_CACHE[key]
    from flowtron_tpu.audio.stft import MelSpectrogram
    from flowtron_tpu.data.synth import _char_timbre

    msp = MelSpectrogram(filter_length, hop_length, win_length,
                         n_mel_channels, sampling_rate, mel_fmin, mel_fmax)
    rows = []
    n = int(0.3 * sampling_rate)
    t = np.arange(n) / sampling_rate
    for i in range(26):
        f0, amps = _char_timbre(chr(ord("a") + i))
        seg = np.zeros(n)
        for h, a in enumerate(amps):
            seg += a * np.sin(2 * np.pi * f0 * pitch_shift * (h + 1) * t)
        seg = seg / np.abs(seg).max() * 0.7
        logmel = msp.mel_numpy(seg.astype(np.float32))
        row = np.exp(logmel[:, 5:-5].astype(np.float64)).mean(-1)
        rows.append(row / max(np.linalg.norm(row), 1e-12))
    out = np.stack(rows)
    _TEMPLATE_CACHE[key] = out
    return out


def templates_from_config(data_config, pitch_shift=1.0, n_mel_channels=80):
    dc = data_config
    return char_templates(
        int(dc.get("filter_length", 1024)), int(dc.get("hop_length", 256)),
        int(dc.get("win_length", 1024)), int(dc.get("sampling_rate", 22050)),
        float(dc.get("mel_fmin", 0.0)), float(dc.get("mel_fmax", 8000.0)),
        pitch_shift=pitch_shift, n_mel_channels=n_mel_channels)


def levenshtein(a, b):
    """Edit distance between two sequences (insert/delete/substitute)."""
    m, n = len(a), len(b)
    if n == 0:
        return m
    d = np.arange(n + 1)
    for i in range(1, m + 1):
        prev = d.copy()
        d[0] = i
        for j in range(1, n + 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1,
                       prev[j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[n])


def cer(hyp, ref):
    """Character error rate: edit distance / len(ref). Can exceed 1."""
    return levenshtein(hyp, ref) / max(len(ref), 1)


def decode_mel(mel, templates, min_run=2, min_sil=2, sim_floor=0.85,
               energy_rel=0.15):
    """(n_mel, T) log-mel -> decoded string.

    Per frame: silence when linear energy falls below ``energy_rel`` of
    the utterance's 90th-percentile frame energy; otherwise the
    highest-cosine template, or "unsure" below ``sim_floor`` (breaks
    runs without emitting — transition frames between two tones match
    neither). Runs of >= min_run identical labels emit one character;
    silence runs of >= min_sil emit one space.
    """
    mel = np.asarray(mel)
    if mel.ndim != 2 or mel.shape[1] == 0:
        return ""
    lin = np.exp(mel.astype(np.float64))
    energy = lin.sum(0)
    thr = energy_rel * np.percentile(energy, 90)
    voiced = energy > max(thr, 1e-10)
    norm = lin / np.maximum(np.linalg.norm(lin, axis=0, keepdims=True),
                            1e-12)
    sims = templates @ norm                       # (26, T)
    best, labels = sims.max(0), sims.argmax(0)
    frames = np.where(~voiced, -1, np.where(best >= sim_floor, labels, -2))
    out = []
    i, T = 0, len(frames)
    while i < T:
        j = i
        while j < T and frames[j] == frames[i]:
            j += 1
        run, f = j - i, frames[i]
        if f == -1:
            if run >= min_sil and out:
                out.append(" ")
        elif f >= 0 and run >= min_run:
            out.append(chr(ord("a") + f))
        i = j
    return " ".join("".join(out).split())


def decode_audio(wave, data_config=None, pitch_shift=1.0,
                 n_mel_channels=80, **decode_kwargs):
    """Waveform in [-1, 1] -> decoded string (STFT -> mel -> decode)."""
    from flowtron_tpu.audio.stft import MelSpectrogram
    dc = dict(data_config or {})
    msp = MelSpectrogram(
        int(dc.get("filter_length", 1024)), int(dc.get("hop_length", 256)),
        int(dc.get("win_length", 1024)), n_mel_channels,
        int(dc.get("sampling_rate", 22050)), float(dc.get("mel_fmin", 0.0)),
        float(dc.get("mel_fmax", 8000.0)))
    wave = np.asarray(wave, np.float32).reshape(-1)
    peak = float(np.abs(wave).max())
    if peak > 0:
        wave = wave / peak * 0.7
    mel = msp.mel_numpy(wave)
    templates = templates_from_config(dc, pitch_shift=pitch_shift,
                                      n_mel_channels=n_mel_channels)
    return decode_mel(mel, templates, **decode_kwargs)


def corpus_pitch_shift(speaker_id):
    """The per-speaker f0 scale make_aligned_corpus applies."""
    return 2.0 ** (int(speaker_id) / 8.0)


def transcribe_model(params, static_cfg, config, entries, n_frames=640,
                     sigma=0.5, gate_threshold=0.5, seed=1234,
                     via_audio=True, gl_iters=30):
    """Synthesize each (text, speaker_id) entry and decode it back.

    Returns one row per entry: the requested text, the mel-domain
    decode (straight off the model's output), and — when ``via_audio``
    — the full-chain decode through Griffin-Lim mel inversion, with
    their CERs. Uses a fixed ``n_frames`` latent so every call shares
    one compiled program; the model's gate decides the actual length.
    """
    from flowtron_tpu.infer.sampling import (synthesize,
                                             mel_to_audio_griffinlim)
    from flowtron_tpu.text import text_to_sequence

    data_config = dict(config["data_config"])
    n_mel = int(static_cfg["n_mel_channels"])
    rows = []
    for k, (text, sid) in enumerate(entries):
        ids = text_to_sequence(text)
        mel, _, n_valid = synthesize(
            params, static_cfg, ids, int(sid), n_frames=n_frames,
            sigma=sigma, gate_threshold=gate_threshold, seed=seed + k)
        templates = templates_from_config(
            data_config, pitch_shift=corpus_pitch_shift(sid),
            n_mel_channels=n_mel)
        hyp_mel = decode_mel(mel, templates)
        row = {"text": text, "speaker_id": int(sid), "n_frames": n_valid,
               "hyp_mel": hyp_mel, "cer_mel": cer(hyp_mel, text)}
        if via_audio:
            audio = np.asarray(mel_to_audio_griffinlim(
                mel, data_config, n_iters=gl_iters)).reshape(-1)
            hyp = decode_audio(audio, data_config,
                               pitch_shift=corpus_pitch_shift(sid),
                               n_mel_channels=n_mel)
            row["hyp_audio"] = hyp
            row["cer_audio"] = cer(hyp, text)
        rows.append(row)
    return rows


def tone_cer_report(config, params, static_cfg, max_texts=8, seed=1234,
                    via_audio=True, n_frames=640, filelist=None,
                    sigma=0.5):
    """Mean tone-CER of the model over held-out corpus transcripts.

    Reads (text, speaker) pairs from ``filelist`` (default: the
    config's validation filelist), synthesizes each, and reports
    ``tone_cer`` (full audio chain) and ``tone_cer_mel`` (decoded
    straight from the model's mel output) plus the per-text rows.
    """
    from flowtron_tpu.data.dataset import load_filepaths_and_text

    data_config = config["data_config"]
    path = filelist or data_config["validation_files"]
    entries = [(text, sid) for (_, text, sid)
               in load_filepaths_and_text(path)][:max_texts]
    # sigma defaults to the reference's inference operating point
    # (reference:inference.py:104-108, -s 0.5), not the training sigma
    rows = transcribe_model(
        params, static_cfg, config, entries, n_frames=n_frames,
        sigma=sigma, seed=seed, via_audio=via_audio)
    report = {
        "tone_cer_mel": float(np.mean([r["cer_mel"] for r in rows])),
        "rows": rows,
    }
    if via_audio:
        report["tone_cer"] = float(np.mean([r["cer_audio"] for r in rows]))
    return report
