"""TensorBoard observability (reference:flowtron_logger.py:24-54,
flowtron_plotting_utils.py:23-62): training/validation scalars plus
attention-alignment and gate plots for a random validation element."""

import numpy as np

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


def plot_alignment_to_numpy(alignment):
    """(T_text, T_mel) alignment -> HWC uint8 image."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(alignment, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Decoder timestep")
    ax.set_ylabel("Encoder timestep")
    fig.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


def plot_gate_outputs_to_numpy(gate_targets, gate_outputs):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 3))
    ax.scatter(range(len(gate_targets)), gate_targets, alpha=0.5,
               color="green", marker="+", s=1, label="target")
    ax.scatter(range(len(gate_outputs)), gate_outputs, alpha=0.5,
               color="red", marker=".", s=1, label="predicted")
    ax.set_xlabel("Frames")
    ax.set_ylabel("Gate state")
    fig.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


class FlowtronLogger:
    def __init__(self, logdir):
        if SummaryWriter is None:
            raise RuntimeError("tensorboardX is not available")
        self.writer = SummaryWriter(logdir)
        self._scalar_tags = set()   # tags written so far (introspection)

    def add_scalar(self, tag, value, step):
        self._scalar_tags.add(tag)
        self.writer.add_scalar(tag, value, step)

    def log_training(self, loss, gate_loss, nll_loss, ctc_loss,
                     learning_rate, iteration):
        self.add_scalar("training/loss", loss, iteration)
        self.add_scalar("training/loss_gate", gate_loss, iteration)
        self.add_scalar("training/loss_nll", nll_loss, iteration)
        self.add_scalar("training/loss_ctc", ctc_loss, iteration)
        self.add_scalar("learning_rate", learning_rate, iteration)

    def log_validation(self, loss, nll, gate, ctc, last_outputs, iteration):
        self.add_scalar("validation/loss", loss, iteration)
        self.add_scalar("validation/loss_nll", nll, iteration)
        self.add_scalar("validation/loss_gate", gate, iteration)
        self.add_scalar("validation/loss_ctc", ctc, iteration)

        if last_outputs is None:
            return
        attn = np.asarray(last_outputs.get("attn"))
        gate_pred = last_outputs.get("gate_pred")
        vbatch = last_outputs.get("batch") or {}
        if (attn is not None and attn.ndim == 3
                and vbatch.get("out_lens") is not None):
            # the reference's visual "attention looks diagonal" health
            # check (reference:README.md:37-40) as live scalars — the
            # same metrics flowtron-evaluate reports (train/evaluate.py)
            from flowtron_tpu.train.evaluate import (
                attention_diagonality, attention_monotonicity,
                gate_accuracy)
            o, i = vbatch["out_lens"], vbatch["in_lens"]
            self.add_scalar("validation/attn_diagonality",
                            attention_diagonality(attn, o, i), iteration)
            self.add_scalar("validation/attn_monotonicity",
                            attention_monotonicity(attn, o, i), iteration)
            if (gate_pred is not None
                    and vbatch.get("gate_target") is not None):
                self.add_scalar(
                    "validation/gate_accuracy",
                    gate_accuracy(gate_pred, vbatch["gate_target"], o),
                    iteration)
        if attn is not None and attn.ndim == 3:
            idx = np.random.randint(attn.shape[0])
            self.writer.add_image(
                "attention_weights",
                plot_alignment_to_numpy(attn[idx].T),
                iteration, dataformats="HWC")
        if gate_pred is not None:
            gp = np.asarray(gate_pred)  # (T, B, 1)
            idx = np.random.randint(gp.shape[1])
            probs = 1.0 / (1.0 + np.exp(-gp[:, idx, 0]))
            batch = last_outputs.get("batch") or {}
            targets = (np.asarray(batch["gate_target"])[idx, :probs.shape[0]]
                       if batch.get("gate_target") is not None
                       else np.zeros_like(probs))
            self.writer.add_image(
                "gate",
                plot_gate_outputs_to_numpy(targets, probs),
                iteration, dataformats="HWC")
