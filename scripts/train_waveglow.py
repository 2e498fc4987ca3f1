#!/usr/bin/env python
"""Train the WaveGlow-style vocoder:

python scripts/train_waveglow.py -c configs/config_waveglow.json

Random audio segments -> mel conditioning -> flow NLL, Adam, bf16 policy,
data-parallel over the device mesh. (The reference treats the vocoder as an
external pretrained submodule; this provides the training capability
in-framework.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-p", "--params", nargs="+", default=[])
    args = parser.parse_args()

    from flowtron_tpu.cli import _apply_platform_override
    _apply_platform_override()

    import json
    import pickle
    import jax
    import jax.numpy as jnp
    import optax
    from flowtron_tpu.config import update_params
    from flowtron_tpu.vocoder import waveglow_init, waveglow_forward, \
        waveglow_loss
    from flowtron_tpu.audio import MelSpectrogram
    from flowtron_tpu.data import load_filepaths_and_text, load_wav
    from flowtron_tpu.parallel.mesh import make_mesh, replicated, data_sharded

    with open(args.config) as f:
        config = json.load(f)
    if args.params:
        update_params(config, args.params)
    tc, dc, wc = (config["train_config"], config["data_config"],
                  config["waveglow_config"])

    seed = int(tc.get("seed", 1234))
    key = jax.random.PRNGKey(seed)
    params, wg_cfg = waveglow_init(key, **wc)

    mesh = make_mesh((-1,))
    n_dev = mesh.devices.size
    batch_size = int(tc["batch_size"]) * n_dev
    seg = int(dc["segment_length"])
    seg = (seg // dc["hop_length"]) * dc["hop_length"]

    ms = MelSpectrogram(dc["filter_length"], dc["hop_length"],
                        dc["win_length"], wc["n_mel_channels"],
                        dc["sampling_rate"], dc["mel_fmin"], dc["mel_fmax"])

    files = [x[0] for x in load_filepaths_and_text(dc["training_files"])]
    rng = np.random.default_rng(seed)

    sigma = float(tc.get("sigma", 1.0))
    opt = optax.adam(float(tc["learning_rate"]))
    opt_state = opt.init(params)
    compute_dtype = jnp.bfloat16 if tc.get("fp16_run") else jnp.float32

    def step(params, opt_state, mel, audio):
        def loss_fn(p):
            pc = jax.tree.map(
                lambda x: x.astype(compute_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, p)
            z, ls, ld = waveglow_forward(pc, wg_cfg,
                                         mel.astype(compute_dtype),
                                         audio.astype(compute_dtype))
            return waveglow_loss(z.astype(jnp.float32),
                                 [l.astype(jnp.float32) for l in ls],
                                 [d.astype(jnp.float32) for d in ld], sigma)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    repl, bshard = replicated(mesh), data_sharded(mesh)
    step = jax.jit(step, in_shardings=(repl, repl, bshard, bshard),
                   donate_argnums=(0, 1))

    def sample_batch():
        audio = np.zeros((batch_size, seg), np.float32)
        for i in range(batch_size):
            path = files[rng.integers(len(files))]
            wav, _ = load_wav(path)
            wav = wav / dc["max_wav_value"]
            if len(wav) >= seg:
                s = rng.integers(len(wav) - seg + 1)
                audio[i] = wav[s:s + seg]
            else:
                audio[i, :len(wav)] = wav
        mel = np.stack([ms.mel_numpy(a)[:, :seg // dc["hop_length"]]
                        for a in audio])
        return mel, audio

    out_dir = tc.get("output_directory", "outdir_waveglow")
    os.makedirs(out_dir, exist_ok=True)
    iteration = 0
    t0 = time.time()
    for epoch in range(int(tc.get("epochs", 1))):
        for _ in range(max(1, len(files) // batch_size)):
            mel, audio = sample_batch()
            params, opt_state, loss = step(
                params, opt_state,
                jax.device_put(mel, bshard), jax.device_put(audio, bshard))
            print(f"{iteration}:\t{float(loss):.6f}\t"
                  f"({time.time() - t0:.2f}s)", flush=True)
            t0 = time.time()
            if iteration % int(tc.get("iters_per_checkpoint", 2000)) == 0:
                with open(os.path.join(out_dir,
                                       f"waveglow_{iteration}"), "wb") as f:
                    pickle.dump({"params": jax.tree.map(np.asarray, params),
                                 "config": wg_cfg}, f)
            iteration += 1


if __name__ == "__main__":
    main()
