#!/usr/bin/env python
"""Generate `wav_path|transcript|speaker_id` filelists from common datasets.

The reference ships pre-built LJSpeech/LibriTTS filelists; this tool builds
them reproducibly from the datasets themselves instead.

LJSpeech (metadata.csv):
  python scripts/make_filelists.py ljspeech /data/LJSpeech-1.1 \
      -o filelists --val-count 57

LibriTTS (train-clean-100 layout, <=10 s, >=5 min per speaker — the
reference's selection recipe):
  python scripts/make_filelists.py libritts /data/LibriTTS/train-clean-100 \
      -o filelists --max-seconds 10 --min-speaker-minutes 5 --val-count 179
"""

import argparse
import os
import wave


def _wav_seconds(path):
    try:
        with wave.open(path, "rb") as w:
            return w.getnframes() / w.getframerate()
    except Exception:
        return None


def build_ljspeech(root, out_dir, val_count):
    meta = os.path.join(root, "metadata.csv")
    lines = []
    with open(meta, encoding="utf-8") as f:
        for row in f:
            parts = row.rstrip("\n").split("|")
            if len(parts) < 3:
                continue
            wav = os.path.join(root, "wavs", parts[0] + ".wav")
            text = parts[2] or parts[1]  # normalized text preferred
            lines.append(f"{wav}|{text}|0")
    val = lines[:val_count]
    train = lines[val_count:]
    _write(out_dir, "ljs_audiopaths_text_sid_train_filelist.txt", train)
    _write(out_dir, "ljs_audiopaths_text_sid_val_filelist.txt", val)


def build_libritts(root, out_dir, max_seconds, min_speaker_minutes,
                   val_count):
    per_speaker = {}
    for dirpath, _, files in os.walk(root):
        for fn in sorted(files):
            if not fn.endswith(".wav"):
                continue
            wav = os.path.join(dirpath, fn)
            txt = wav.replace(".wav", ".normalized.txt")
            if not os.path.exists(txt):
                txt = wav.replace(".wav", ".txt")
                if not os.path.exists(txt):
                    continue
            secs = _wav_seconds(wav)
            if secs is None or secs > max_seconds:
                continue
            sid = fn.split("_")[0]
            with open(txt, encoding="utf-8") as f:
                text = f.read().strip().replace("|", " ")
            per_speaker.setdefault(sid, []).append((wav, text, secs))

    lines = []
    kept_speakers = 0
    for sid, utts in sorted(per_speaker.items()):
        total = sum(s for _, _, s in utts)
        if total < min_speaker_minutes * 60:
            continue
        kept_speakers += 1
        lines.extend(f"{wav}|{text}|{sid}" for wav, text, _ in utts)
    print(f"{kept_speakers} speakers, {len(lines)} utterances")

    val = lines[:val_count]
    train = lines[val_count:]
    _write(out_dir,
           "libritts_train_clean_100_audiopath_text_sid_train_filelist.txt",
           train)
    _write(out_dir,
           "libritts_train_clean_100_audiopath_text_sid_val_filelist.txt",
           val)


def _write(out_dir, name, lines):
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines):6d} lines -> {path}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", choices=["ljspeech", "libritts"])
    parser.add_argument("root")
    parser.add_argument("-o", "--out-dir", default="filelists")
    parser.add_argument("--val-count", type=int, default=57)
    parser.add_argument("--max-seconds", type=float, default=10.0)
    parser.add_argument("--min-speaker-minutes", type=float, default=5.0)
    args = parser.parse_args()

    if args.dataset == "ljspeech":
        build_ljspeech(args.root, args.out_dir, args.val_count)
    else:
        build_libritts(args.root, args.out_dir, args.max_seconds,
                       args.min_speaker_minutes, args.val_count)


if __name__ == "__main__":
    main()
