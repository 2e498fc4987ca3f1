"""RAdam parity vs a numpy oracle implementing the reference math
(reference:radam.py:44-122) step by step."""

import math

import numpy as np
import jax.numpy as jnp
import optax

from flowtron_tpu.train.radam import radam, build_optimizer


def reference_radam_run(grads_seq, p0, lr, betas=(0.9, 0.999), eps=1e-8,
                        weight_decay=0.0):
    """Numpy transliteration of the reference's update rule."""
    b1, b2 = betas
    p = p0.astype(np.float64).copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    for t, g in enumerate(grads_seq, start=1):
        g = g.astype(np.float64)
        v = b2 * v + (1 - b2) * g * g
        m = b1 * m + (1 - b1) * g
        beta2_t = b2 ** t
        n_sma_max = 2 / (1 - b2) - 1
        n_sma = n_sma_max - 2 * t * beta2_t / (1 - beta2_t)
        if n_sma >= 5:
            step_size = lr * math.sqrt(
                (1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2)
            ) / (1 - b1 ** t)
        else:
            step_size = lr / (1 - b1 ** t)
        if weight_decay != 0:
            p += -weight_decay * lr * p
        if n_sma >= 5:
            p += -step_size * m / (np.sqrt(v) + eps)
        else:
            p += -step_size * m
    return p


class TestRAdam:
    def _run_ours(self, grads_seq, p0, **kw):
        opt = radam(**kw)
        params = {"x": jnp.asarray(p0)}
        state = opt.init(params)
        for g in grads_seq:
            updates, state = opt.update({"x": jnp.asarray(g)}, state, params)
            params = optax.apply_updates(params, updates)
        return np.asarray(params["x"])

    def test_early_steps_unrectified(self):
        """t <= 5 with beta2=0.999 uses the plain-momentum branch."""
        rng = np.random.default_rng(0)
        p0 = rng.standard_normal(7).astype(np.float32)
        grads = [rng.standard_normal(7).astype(np.float32) for _ in range(4)]
        ref = reference_radam_run(grads, p0, lr=1e-2)
        ours = self._run_ours(grads, p0, learning_rate=1e-2)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_crosses_rectification_threshold(self):
        """Long run spans both branches (switch at t=6 for beta2=0.999)."""
        rng = np.random.default_rng(1)
        p0 = rng.standard_normal(5).astype(np.float32)
        grads = [rng.standard_normal(5).astype(np.float32)
                 for _ in range(20)]
        ref = reference_radam_run(grads, p0, lr=1e-3)
        ours = self._run_ours(grads, p0, learning_rate=1e-3)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_weight_decay(self):
        rng = np.random.default_rng(2)
        p0 = rng.standard_normal(5).astype(np.float32)
        grads = [rng.standard_normal(5).astype(np.float32)
                 for _ in range(10)]
        ref = reference_radam_run(grads, p0, lr=1e-3, weight_decay=1e-2)
        ours = self._run_ours(grads, p0, learning_rate=1e-3,
                              weight_decay=1e-2)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_build_optimizer_clip(self):
        opt = build_optimizer("RAdam", 1e-3, 1e-6, grad_clip_val=1.0)
        params = {"x": jnp.ones(3)}
        state = opt.init(params)
        big_grad = {"x": jnp.full(3, 100.0)}
        updates, _ = opt.update(big_grad, state, params)
        # after clipping to norm 1, first unrectified step is lr-scale
        assert np.abs(np.asarray(updates["x"])).max() < 0.1

    def test_adam_matches_torch(self):
        import torch
        p0 = np.array([0.5, -1.0, 2.0], np.float32)
        grads = [np.array([0.1, -0.2, 0.3], np.float32)] * 8

        t_p = torch.tensor(p0, requires_grad=True)
        t_opt = torch.optim.Adam([t_p], lr=1e-2, weight_decay=1e-3)
        for g in grads:
            t_p.grad = torch.tensor(g)
            t_opt.step()

        opt = build_optimizer("Adam", 1e-2, 1e-3)
        params = {"x": jnp.asarray(p0)}
        state = opt.init(params)
        for g in grads:
            updates, state = opt.update({"x": jnp.asarray(g)}, state, params)
            params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params["x"]),
                                   t_p.detach().numpy(), atol=1e-5)
