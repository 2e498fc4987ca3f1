#!/usr/bin/env python
"""Style-transfer CLI (reference notebook inference_style_transfer.ipynb):

python scripts/style_transfer.py -c config.json -f flowtron_ckpt \
    -r reference_filelist.txt -t "target text" -i speaker_id \
    [-n 400 -s 0.5 -o results]

Collects z over the reference utterances, forms the ridge posterior mean,
samples around it, and synthesizes the target text in the transferred style.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-p", "--params", nargs="+", default=[])
    parser.add_argument("-f", "--flowtron_path", required=True)
    parser.add_argument("-r", "--reference_filelist", required=True,
                        help="filelist of style-reference utterances")
    parser.add_argument("-t", "--text", required=True)
    parser.add_argument("-i", "--id", type=int, default=0)
    parser.add_argument("-n", "--n_frames", type=int, default=400)
    parser.add_argument("-s", "--sigma", type=float, default=0.5)
    parser.add_argument("-g", "--gate", type=float, default=0.5)
    parser.add_argument("-o", "--output_dir", default="results")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--lambd", type=float, default=1e-4)
    args = parser.parse_args()

    from flowtron_tpu.cli import _apply_platform_override
    _apply_platform_override()
    from flowtron_tpu.config import load_config
    from flowtron_tpu.data import Data, DataCollate
    from flowtron_tpu.infer.sampling import load_model_for_inference, \
        mel_to_audio_griffinlim
    from flowtron_tpu.infer.style_transfer import style_transfer

    config = load_config(args.config, args.params)
    data_config = dict(config["data_config"])
    params, static_cfg = load_model_for_inference(config,
                                                  args.flowtron_path)

    from flowtron_tpu.data.dataset import data_kwargs
    dataset = Data(args.reference_filelist, **data_kwargs(data_config))
    items = [dataset[i] for i in range(len(dataset))]
    batch = DataCollate(use_attn_prior=False)(items)

    text_ids = dataset.get_text(args.text)
    mel, n = style_transfer(params, static_cfg, batch, text_ids, args.id,
                            n_frames=args.n_frames, sigma=args.sigma,
                            gate_threshold=args.gate, seed=args.seed,
                            lam=args.lambd)
    print(f"synthesized {n} frames")

    os.makedirs(args.output_dir, exist_ok=True)
    base = os.path.join(args.output_dir, f"style_sid{args.id}_seed{args.seed}")
    np.save(base + "_mel.npy", mel)
    audio = mel_to_audio_griffinlim(mel, data_config)
    audio = audio / max(1e-8, np.abs(audio).max())
    from scipy.io import wavfile
    wavfile.write(base + ".wav", data_config["sampling_rate"],
                  (audio * 32767).astype(np.int16))
    print("wrote", base + ".wav")


if __name__ == "__main__":
    main()
