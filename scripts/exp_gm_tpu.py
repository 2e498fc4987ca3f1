"""GM / style-transfer operating point on the REAL TPU at flagship dims.

Round-2 verdict weak #4: the LibriTTS2K Gaussian-mixture
posterior-sampling config (BASELINE.md "configs to cover" row 5,
configs/config_libritts2k_gm.json, reference notebook
inference_style_transfer.ipynb cells 10-23) had only been validated at
tiny dims on CPU. This script runs the full journey on the device we
ship on:

1. synthesizes a 28-utterance 4-speaker tonal corpus (each speaker is a
   distinct chord — a real "style" for the posterior to capture),
2. trains the GM config (n_components=8, fixed one-hot means,
   mean_scale=3, mel-encoder prior path, CTC from iter 50, bf16+remat)
   for ~150 iterations through the production train() loop,
3. runs posterior-sampling style transfer (collect z over one speaker's
   utterances -> ridge posterior mean -> sample -> invert) from the
   saved checkpoint, timing it and printing mel statistics.

Run: python scripts/exp_gm_tpu.py [workdir]  (defaults /tmp/gm_tpu)
Numbers recorded in PARITY.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_corpus(root, n_speakers=4, per_speaker=7, seconds=2.5,
                sr=22050):
    from scipy.io import wavfile
    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    texts = ["the sun rose over the hill",
             "a quiet voice filled the room",
             "we waited for the rain to stop",
             "this is a synthetic test sentence",
             "speech comes from sound and silence",
             "every speaker has a style",
             "the model learns what it hears"]
    lines = []
    t = np.arange(int(seconds * sr)) / sr
    for s in range(n_speakers):
        # per-speaker chord: base pitch + harmonic stack = the "style"
        f0 = 110.0 * (2 ** (s / 3.0))
        for u in range(per_speaker):
            sig = np.zeros_like(t)
            for h, amp in enumerate((1.0, 0.5, 0.25)):
                f = f0 * (h + 1) * (1.0 + 0.02 * u)
                sig += amp * np.sin(2 * np.pi * f * t)
            # slow amplitude contour so mels are non-stationary
            env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * (0.7 + 0.1 * u) * t))
            sig = sig * env / np.abs(sig * env).max() * 0.7
            sig += 0.01 * rng.standard_normal(len(t))
            path = os.path.join(root, f"s{s}_u{u}.wav")
            wavfile.write(path, sr, (sig * 20000).astype(np.int16))
            lines.append(f"{path}|{texts[u % len(texts)]}|{s}")
    fl = os.path.join(root, "filelist.txt")
    with open(fl, "w") as f:
        f.write("\n".join(lines) + "\n")
    return fl


def main():
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gm_tpu"
    os.makedirs(wd, exist_ok=True)
    fl = make_corpus(os.path.join(wd, "corpus"))

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))
    from flowtron_tpu.config import load_config

    cfg_path = os.path.join(os.path.dirname(__file__), "..",
                            "configs", "config_libritts2k_gm.json")
    config = load_config(cfg_path, [
        f"data_config.training_files={fl}",
        f"data_config.validation_files={fl}",
        "model_config.n_speakers=4",
        "train_config.batch_size=4",
        "train_config.epochs=22",
        "train_config.iters_per_checkpoint=50",
        "train_config.ctc_loss_start_iter=50",
        "train_config.with_tensorboard=False",
        "train_config.remat=True",
        f"train_config.output_directory={wd}/outdir",
    ])

    print(f"backend={jax.default_backend()} "
          f"devices={len(jax.devices())}", flush=True)

    from flowtron_tpu.train.loop import train
    t0 = time.perf_counter()
    train(config)
    t_train = time.perf_counter() - t0
    print(f"training wall time: {t_train:.1f}s", flush=True)

    # ---- style transfer from the saved checkpoint --------------------
    from flowtron_tpu.infer.sampling import load_model_for_inference
    from flowtron_tpu.infer.style_transfer import style_transfer
    from flowtron_tpu.data import Data, DataCollate
    from flowtron_tpu.data.dataset import data_kwargs

    ckpt = os.path.join(wd, "outdir", "model_150")
    params, static_cfg = load_model_for_inference(config, ckpt)
    dc = dict(config["data_config"])
    dataset = Data(dc["training_files"], **data_kwargs(dc))
    collate = DataCollate(use_attn_prior=False)

    # style references: 4 utterances of speaker 3
    ref_rows = [i for i, (p, t, s) in
                enumerate(dataset.audiopaths_and_text) if s == "3"][:4]
    items = [dataset[i] for i in ref_rows]
    ref_batch = collate([(m, s, t, None) for (m, s, t, _p) in items])

    target_ids = dataset.get_text("a brand new sentence in that style")
    t0 = time.perf_counter()
    mel_out, n_valid = style_transfer(
        params, static_cfg, ref_batch, target_ids,
        int(dataset.get_speaker_id(3)), n_frames=400, sigma=0.5,
        seed=1234)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    mel_out, n_valid = style_transfer(
        params, static_cfg, ref_batch, target_ids,
        int(dataset.get_speaker_id(3)), n_frames=400, sigma=0.5,
        seed=4321)
    t_warm = time.perf_counter() - t0

    summary = {
        "train_wall_s": round(t_train, 1),
        "style_transfer_cold_s": round(t_cold, 2),
        "style_transfer_warm_s": round(t_warm, 2),
        "n_valid": int(n_valid),
        "mel_shape": list(np.asarray(mel_out).shape),
        "mel_mean": float(np.mean(mel_out)),
        "mel_std": float(np.std(mel_out)),
        "mel_finite": bool(np.isfinite(mel_out).all()),
    }
    print("GM_TPU_SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
