"""Standalone checkpoint evaluation (no training step).

The reference reports validation loss only from inside the training
loop (reference:train.py:142-202), and its invertibility oracle was
never runnable as shipped (reference:flowtron.py:932-954, the 7-from-8
unpacking bug). This module evaluates any checkpoint directly: the same
nll/gate/ctc decomposition over the validation filelist, plus the
fixed invertibility round-trip error — the "is this checkpoint
healthy?" check without starting a training run.
"""

import numpy as np
import jax
import jax.numpy as jnp


def _save_plots(last, out_dir):
    """Attention-alignment + gate plots for a validation batch — the
    reference's de-facto health metric ("train until attention looks
    good", reference:README.md:37-40), produced without TensorBoard."""
    import os
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.image as mpimg
    from flowtron_tpu.train.logger import (plot_alignment_to_numpy,
                                           plot_gate_outputs_to_numpy)

    os.makedirs(out_dir, exist_ok=True)
    attn = np.asarray(last["attn"])  # (B, T_mel, T_text)
    mpimg.imsave(os.path.join(out_dir, "attention.png"),
                 plot_alignment_to_numpy(attn[0].T))
    gp = np.asarray(last["gate_pred"])  # (T, B, 1)
    probs = 1.0 / (1.0 + np.exp(-gp[:, 0, 0]))
    mpimg.imsave(os.path.join(out_dir, "gate.png"),
                 plot_gate_outputs_to_numpy(np.zeros_like(probs), probs))


def evaluate(config, checkpoint_path, invertibility_frames=100,
             seed=1234, plots_dir=None):
    """Returns a dict: val loss decomposition (+ n_batches), and the
    invertibility round-trip error when invertibility_frames > 0.
    With plots_dir, writes attention.png + gate.png for the last
    validation batch.

    Accepts every checkpoint format the framework reads (pickle /
    sharded / orbax / reference-format torch state_dict).
    """
    from flowtron_tpu.infer.sampling import load_model_for_inference
    from flowtron_tpu.parallel.mesh import make_mesh
    from flowtron_tpu.train.loop import (
        make_eval_step, prepare_dataloaders, compute_validation_loss)

    train_config = config["train_config"]
    data_config = dict(config["data_config"])

    params, static_cfg = load_model_for_inference(config, checkpoint_path)
    mesh = make_mesh((-1,), ("data",))
    # validation semantics == training-time validation: CTC on when the
    # config trains with it (the start-iter gating is a training-phase
    # concern; an evaluated checkpoint is past it)
    eval_step = make_eval_step(static_cfg, mesh, train_config)
    batch_size = int(train_config["batch_size"])
    _, val_loader = prepare_dataloaders(data_config, batch_size,
                                        seed=seed)
    ctc_w = (float(train_config.get("ctc_loss_weight", 0.0))
             if train_config.get("use_ctc_loss") else 0.0)
    totals, last = compute_validation_loss(eval_step, params, val_loader,
                                           mesh, ctc_w)
    result = dict(totals)
    if plots_dir and last is not None:
        _save_plots(last, plots_dir)

    if invertibility_frames and invertibility_frames > 0:
        from flowtron_tpu.models.flowtron import (
            flowtron_test_invertibility)
        # a real validation utterance's text/speaker, a sampled latent
        batch = next(iter(val_loader))
        T_in = int(batch["in_lens"][0])
        text = jnp.asarray(batch["text"][:1, :max(1, T_in)])
        sid = jnp.asarray(batch["speaker_ids"][:1])
        n_mel = int(static_cfg["n_mel_channels"])
        sigma = float(train_config.get("sigma", 1.0))
        residual = sigma * jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, n_mel, int(invertibility_frames)), jnp.float32)
        err = flowtron_test_invertibility(params, static_cfg, residual,
                                          sid, text)
        result["invertibility_err"] = float(err)
    return result
