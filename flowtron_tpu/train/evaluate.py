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


def _isotonic_increasing(y):
    """L2 isotonic regression (pool-adjacent-violators): the best
    non-decreasing fit to y. Pure numpy, O(n)."""
    vals, wts = [], []
    for v in np.asarray(y, np.float64):
        vals.append(float(v))
        wts.append(1)
        while len(vals) > 1 and vals[-2] > vals[-1]:
            v2, w2 = vals.pop(), wts.pop()
            v1, w1 = vals.pop(), wts.pop()
            vals.append((v1 * w1 + v2 * w2) / (w1 + w2))
            wts.append(w1 + w2)
    out = np.empty(len(y))
    i = 0
    for v, w in zip(vals, wts):
        out[i:i + w] = v
        i += w
    return out


def attention_diagonality(attn, out_lens, in_lens, band=0.12):
    """The reference's de-facto health metric is "attention looks
    diagonal" (reference:README.md:37-40); this makes it a number in
    [0, 1]: the mean attention mass within a +-band of the ideal
    diagonal (mel frame t attends near text position t * T_text/T_mel),
    over valid frames/positions. A trained, aligned model scores near 1;
    untrained or collapsed attention scores ~2*band or less."""
    attn = np.asarray(attn)
    scores = []
    for b in range(attn.shape[0]):
        O, I = int(out_lens[b]), int(in_lens[b])
        if O < 2 or I < 2:
            continue
        A = attn[b, :O, :I].astype(np.float64)
        A /= np.maximum(A.sum(-1, keepdims=True), 1e-8)
        t = np.arange(O)[:, None] / (O - 1)
        k = np.arange(I)[None, :] / (I - 1)
        r = max(band, 2.0 / I)  # never narrower than ~2 text positions
        scores.append(float((A * (np.abs(k - t) <= r)).sum() / O))
    return float(np.mean(scores)) if scores else 0.0


def attention_monotonicity(attn, out_lens, in_lens):
    """1 - normalized deviation of the attention centroid
    E[text pos | mel frame] from its best monotone (isotonic) fit.
    1.0 = the alignment only ever moves forward through the text;
    oscillating/jumpy attention scores lower. Complements
    attention_diagonality (a flat centroid is monotone but not
    diagonal)."""
    attn = np.asarray(attn)
    scores = []
    for b in range(attn.shape[0]):
        O, I = int(out_lens[b]), int(in_lens[b])
        if O < 2 or I < 2:
            continue
        A = attn[b, :O, :I].astype(np.float64)
        A /= np.maximum(A.sum(-1, keepdims=True), 1e-8)
        c = (A * np.arange(I)).sum(-1)
        dev = np.mean(np.abs(c - _isotonic_increasing(c))) / max(I - 1, 1)
        scores.append(1.0 - min(1.0, float(dev)))
    return float(np.mean(scores)) if scores else 0.0


def gate_accuracy(gate_logits, gate_target, out_lens):
    """Fraction of valid frames where the thresholded gate prediction
    (sigmoid(logit) > 0.5) matches the target (1 from the last real
    frame, reference:data.py:236-238). Valid = t < out_len, the same
    frames the gate loss is computed over."""
    gp = np.asarray(gate_logits)[:, :, 0].T  # (T, B, 1) -> (B, T)
    gt = np.asarray(gate_target)
    correct, total = 0, 0
    for b in range(gt.shape[0]):
        O = int(out_lens[b])
        pred = gp[b, :O] > 0.0
        correct += int((pred == (gt[b, :O] > 0.5)).sum())
        total += O
    return correct / max(total, 1)


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
    batch = last.get("batch") or {}
    targets = (np.asarray(batch["gate_target"])[0, :probs.shape[0]]
               if batch.get("gate_target") is not None
               else np.zeros_like(probs))
    mpimg.imsave(os.path.join(out_dir, "gate.png"),
                 plot_gate_outputs_to_numpy(targets, probs))


def evaluate(config, checkpoint_path, invertibility_frames=100,
             seed=1234, plots_dir=None, tone_cer_texts=0):
    """Returns a dict: val loss decomposition (+ n_batches), and the
    invertibility round-trip error when invertibility_frames > 0.
    With plots_dir, writes attention.png + gate.png for the last
    validation batch. With tone_cer_texts > 0, synthesizes that many
    validation transcripts and reports the tone-CER intelligibility
    metric (data/tone_cer.py) — content-level correctness on the
    coded-tone corpus, the in-container analog of the reference's
    listen-to-it check (reference:README.md:27-40).

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

    # quality proxies accumulated over every validation batch: the
    # reference's "attention looks diagonal" check as numbers
    qual = {"attn_diagonality": [], "attn_monotonicity": [],
            "gate_accuracy": []}

    def on_batch(out, batch):
        attn = np.asarray(out["attn"])
        qual["attn_diagonality"].append(attention_diagonality(
            attn, batch["out_lens"], batch["in_lens"]))
        qual["attn_monotonicity"].append(attention_monotonicity(
            attn, batch["out_lens"], batch["in_lens"]))
        qual["gate_accuracy"].append(gate_accuracy(
            out["gate_pred"], batch["gate_target"], batch["out_lens"]))

    totals, last = compute_validation_loss(eval_step, params, val_loader,
                                           mesh, ctc_w, on_batch=on_batch)
    result = dict(totals)
    for k, v in qual.items():
        if v:
            result[k] = float(np.mean(v))
    if plots_dir and last is not None:
        _save_plots(last, plots_dir)

    if tone_cer_texts and tone_cer_texts > 0:
        from flowtron_tpu.data.tone_cer import tone_cer_report
        report = tone_cer_report(config, params, static_cfg,
                                 max_texts=int(tone_cer_texts), seed=seed)
        result["tone_cer"] = report["tone_cer"]
        result["tone_cer_mel"] = report["tone_cer_mel"]

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
