"""Observability tests: TensorBoard logger scalars and plot rendering."""

import os

import numpy as np

from flowtron_tpu.train.logger import (
    FlowtronLogger, plot_alignment_to_numpy, plot_gate_outputs_to_numpy,
)


class TestPlots:
    def test_alignment_plot_shape(self):
        img = plot_alignment_to_numpy(
            np.random.default_rng(0).uniform(size=(20, 40)))
        assert img.ndim == 3 and img.shape[2] == 3
        assert img.dtype == np.uint8

    def test_gate_plot(self):
        t = np.zeros(50)
        t[40:] = 1
        p = 1 / (1 + np.exp(-np.random.default_rng(1).standard_normal(50)))
        img = plot_gate_outputs_to_numpy(t, p)
        assert img.ndim == 3 and img.shape[2] == 3


class TestLogger:
    def test_scalars_and_images_written(self, tmp_path):
        logdir = str(tmp_path / "tb")
        logger = FlowtronLogger(logdir)
        logger.log_training(1.5, 0.1, 1.2, 0.2, 1e-3, iteration=3)
        last = {
            "attn": np.random.default_rng(0).uniform(size=(2, 10, 6)),
            "gate_pred": np.random.default_rng(1)
            .standard_normal((10, 2, 1)),
            "batch": {
                "out_lens": np.array([10, 8]),
                "in_lens": np.array([6, 5]),
                "gate_target": np.zeros((2, 10), np.float32),
            },
        }
        logger.log_validation(1.4, 1.1, 0.1, 0.2, last, iteration=3)
        logger.writer.flush()
        # quality-proxy scalars landed next to the losses
        scalars = set(logger._scalar_tags)
        assert {"validation/attn_diagonality",
                "validation/attn_monotonicity",
                "validation/gate_accuracy"} <= scalars
        files = os.listdir(logdir)
        assert any("tfevents" in f for f in files)
        # event file is non-trivial (contains the image summaries)
        path = os.path.join(logdir, [f for f in files if "tfevents" in f][0])
        assert os.path.getsize(path) > 1000

    def test_validation_without_outputs(self, tmp_path):
        logger = FlowtronLogger(str(tmp_path / "tb2"))
        logger.log_validation(1.0, 0.8, 0.1, 0.1, None, iteration=1)
