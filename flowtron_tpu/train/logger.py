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

    def add_scalar(self, tag, value, step):
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
