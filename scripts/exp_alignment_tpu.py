#!/usr/bin/env python
"""Alignment learning on the coded-tone corpus (real TPU).

The reference's training recipe is "train until attention looks
diagonal" on recorded speech (reference:README.md:16-40). No speech
ships in this container, but data/synth.py renders text as audio whose
frames monotonically encode the character sequence — so the alignment
is LEARNABLE and the quality-proxy metrics (train/evaluate.py) can
witness it being learned, not just the NLL dropping.

Runs the full production stack (data pipeline -> beta-binomial prior ->
bf16 remat training via train() -> pickle checkpoints), evaluates every
saved checkpoint, and prints the metric trajectory. The last checkpoint
is additionally evaluated WITHOUT the attention prior: a model that
merely rides the prior scores low there, one that internalized the
alignment stays high.

Usage: python scripts/exp_alignment_tpu.py [workdir] [iters] [utts] [-p a.b=c ...]
(extra -p overrides are applied last — e.g. -p data_config.use_attn_prior=False
-p train_config.ctc_loss_weight=0.1 trains without the prior scaffold,
leaving the CTC attention supervision as the only alignment pressure;
`utts` sizes the corpus — the round-4 runs used 72 and overfit by 20k
iters, so longer budgets want 256+)
"""

import glob
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    extra = []
    rest = sys.argv[1:]
    while "-p" in rest:
        i = rest.index("-p")
        extra.append(rest[i + 1])
        del rest[i:i + 2]
    wd = rest[0] if rest else "/tmp/align_tpu"
    iters = int(rest[1]) if len(rest) > 1 else 1500
    utts = int(rest[2]) if len(rest) > 2 else 72
    os.makedirs(wd, exist_ok=True)

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))

    from flowtron_tpu.data.synth import make_aligned_corpus
    val_count = 8
    train_fl, val_fl = make_aligned_corpus(
        os.path.join(wd, "corpus"), n_utterances=utts, n_speakers=1,
        val_count=val_count, seed=0)

    from flowtron_tpu.config import load_config
    batch_size = 8
    n_train = (utts - val_count) // batch_size * batch_size
    iters_per_epoch = n_train // batch_size
    ckpt_every = max(250, iters // 12)
    cfg_path = os.path.join(os.path.dirname(__file__), "..",
                            "config.json")
    config = load_config(cfg_path, [
        f"data_config.training_files={train_fl}",
        f"data_config.validation_files={val_fl}",
        "data_config.p_arpabet=0.0",
        f"data_config.prior_cache_path={wd}/prior_cache",
        "model_config.n_flows=1",            # the reference's stage-1
        f"train_config.batch_size={batch_size}",
        f"train_config.epochs={math.ceil(iters / iters_per_epoch)}",
        f"train_config.iters_per_checkpoint={ckpt_every}",
        "train_config.ctc_loss_start_iter=100",
        "train_config.with_tensorboard=False",
        "train_config.remat=True",
        f"train_config.output_directory={wd}/outdir",
    ] + extra)

    print(f"backend={jax.default_backend()} "
          f"devices={len(jax.devices())} iters={iters}", flush=True)

    # untrained baseline checkpoint (the metrics' floor)
    from flowtron_tpu.models import flowtron_init
    from flowtron_tpu.train.checkpoints import save_checkpoint
    from flowtron_tpu.train.radam import radam
    mc = dict(config["model_config"])
    p0, _ = flowtron_init(jax.random.PRNGKey(
        int(config["train_config"]["seed"])), **mc)
    init_ckpt = os.path.join(wd, "outdir", "model_init")
    os.makedirs(os.path.join(wd, "outdir"), exist_ok=True)
    save_checkpoint(init_ckpt, p0, radam(1e-3).init(p0), 0, 1e-3)

    from flowtron_tpu.train.loop import train
    t0 = time.perf_counter()
    train(config)
    t_train = time.perf_counter() - t0
    print(f"training wall time: {t_train:.1f}s "
          f"({t_train / iters * 1e3:.0f} ms/iter incl. compile)",
          flush=True)

    from flowtron_tpu.train.evaluate import evaluate
    ckpts = [("init", init_ckpt)]
    found = {}
    for path in glob.glob(os.path.join(wd, "outdir", "model_*")):
        stem = os.path.basename(path)[len("model_"):]
        stem = stem[:-4] if stem.endswith(".pkl") else stem
        if stem.isdigit():
            found[int(stem)] = os.path.join(wd, "outdir",
                                            f"model_{stem}")
    ckpts += [(str(it), p) for it, p in sorted(found.items())]

    keys = ("attn_diagonality", "attn_monotonicity", "gate_accuracy",
            "total", "tone_cer", "tone_cer_mel")
    # the no-prior eval is the one that matters: did the model
    # INTERNALIZE the alignment, or only ride the beta-binomial prior
    # scaffold? Run both per checkpoint.
    import copy
    cfg_np = copy.deepcopy(dict(config))
    cfg_np["data_config"]["use_attn_prior"] = False
    traj = []
    for name, path in ckpts:
        # tone-CER on held-out validation transcripts: the content-level
        # intelligibility check (synthesis must render the REQUESTED
        # tones, not merely align) — see data/tone_cer.py
        r = evaluate(config, path, invertibility_frames=0,
                     tone_cer_texts=8,
                     plots_dir=(os.path.join(wd, f"plots_{name}")
                                if (name, path) in (ckpts[0], ckpts[-1])
                                else None))
        # when the run itself trains without the prior, the no-prior
        # eval IS the eval — don't pay it twice
        rn = r if not config["data_config"].get("use_attn_prior") \
            else evaluate(cfg_np, path, invertibility_frames=0)
        row = {"iter": name}
        row.update({k: round(float(r[k]), 4) for k in keys if k in r})
        row.update({"noprior_" + k: round(float(rn[k]), 4)
                    for k in keys if k in rn})
        traj.append(row)
        print("ALIGN_EVAL " + json.dumps(row), flush=True)

    summary = {
        "iters": iters,
        "train_wall_s": round(t_train, 1),
        "trajectory": traj,
    }
    print("ALIGN_TPU_SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
