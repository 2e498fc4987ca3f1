"""Optimizer parity against the reference's ACTUAL radam.py.

test_radam.py pins our optax RAdam against a hand-written numpy oracle;
this module executes /root/reference/radam.py itself (pure torch, runs
unmodified in-container) and compares full 30-step trajectories — both
sides fed bit-identical synthetic gradients — across the rectification
threshold (N_sma crosses 5 at step 5 for beta2=0.999,
reference:radam.py:95-106) and with decoupled weight decay
(reference:radam.py:109-112).
"""

import importlib.util
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from flowtron_tpu.train.radam import radam

REF_PATH = "/root/reference/radam.py"

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason="reference checkout not available")]


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_radam", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _init_params(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": rng.standard_normal((4, 3)).astype(np.float32),
        "b": rng.standard_normal((3,)).astype(np.float32),
        "s": np.asarray(rng.standard_normal(), dtype=np.float32),
    }


def _grad(step, params):
    """Deterministic, step- and value-dependent gradients."""
    return {k: np.asarray(
                np.cos(0.1 * (step + 1)
                       + np.arange(v.size).reshape(v.shape))
                .astype(np.float32) + 0.1 * v)
            for k, v in params.items()}


def _run_ref(ref, steps, lr, weight_decay):
    params = _init_params()
    tp = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
          for k, v in params.items()}
    opt = ref.RAdam(tp.values(), lr=lr, weight_decay=weight_decay)
    traj = []
    for t in range(steps):
        g = _grad(t, {k: v.detach().numpy() for k, v in tp.items()})
        for k in tp:
            tp[k].grad = torch.from_numpy(g[k])
        opt.step()
        traj.append({k: v.detach().numpy().copy() for k, v in tp.items()})
    return traj


def _run_ours(steps, lr, weight_decay):
    params = {k: jnp.asarray(v) for k, v in _init_params().items()}
    opt = radam(lr, weight_decay=weight_decay)
    state = opt.init(params)
    traj = []
    for t in range(steps):
        g = _grad(t, {k: np.asarray(v) for k, v in params.items()})
        updates, state = opt.update(
            {k: jnp.asarray(v) for k, v in g.items()}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        traj.append({k: np.asarray(v) for k, v in params.items()})
    return traj


class TestReferenceRAdamParity:
    @pytest.mark.parametrize("weight_decay", [0.0, 0.01])
    def test_trajectory(self, ref, weight_decay):
        steps, lr = 30, 1e-2
        ref_traj = _run_ref(ref, steps, lr, weight_decay)
        our_traj = _run_ours(steps, lr, weight_decay)
        # fp32 rounding compounds through the param-dependent gradients:
        # measured max divergence is 6e-8 at step 1 growing to 2.5e-5 at
        # step 30 (both wd values). 1e-4 is ~4x that envelope while a
        # semantic mismatch (wrong rectification branch / bias
        # correction) shows up at >=1e-2 by step 10.
        for t in range(steps):
            for k in ref_traj[t]:
                np.testing.assert_allclose(
                    our_traj[t][k], ref_traj[t][k], atol=1e-4,
                    err_msg=f"step {t} param {k} wd {weight_decay}")

    def test_unrectified_early_steps_differ_from_adam(self, ref):
        """Steps 1-4 use the plain (momentum-only) branch
        (reference:radam.py:104-106, applied at 117-121): the update
        must NOT involve exp_avg_sq yet."""
        ref_traj = _run_ref(ref, 4, 1e-2, 0.0)
        our_traj = _run_ours(4, 1e-2, 0.0)
        for t in range(4):
            for k in ref_traj[t]:
                np.testing.assert_allclose(our_traj[t][k],
                                           ref_traj[t][k], atol=1e-6)
