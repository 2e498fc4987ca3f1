#!/usr/bin/env python
"""CLI shim: dump mel spectrograms for a filelist (reference:data.py:253-283
contract): python data.py -c config.json -f filelist.txt -o outdir
Writes one .npy per wav ("useful for making test sets")."""

import argparse
import json
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-f", "--filelist", type=str, required=True)
    parser.add_argument("-o", "--output_dir", type=str, required=True)
    args = parser.parse_args()

    with open(args.config) as f:
        data_config = json.load(f)["data_config"]

    from flowtron_tpu.cli import _apply_platform_override
    _apply_platform_override()
    from flowtron_tpu.data import Data, load_filepaths_and_text, load_wav
    from flowtron_tpu.data.dataset import data_kwargs
    mel2samp = Data(data_config["training_files"],
                    **data_kwargs(data_config))

    os.makedirs(args.output_dir, exist_ok=True)
    for filepath, text, speaker_id in load_filepaths_and_text(args.filelist):
        print("speaker id", speaker_id)
        print("text", text)
        print("text encoded", mel2samp.get_text(text))
        audio, _ = load_wav(filepath)
        mel = mel2samp.get_mel(audio)
        out = os.path.join(args.output_dir,
                           os.path.basename(filepath) + ".npy")
        np.save(out, mel)
        print(out)


if __name__ == "__main__":
    main()
