"""RAdam as an optax gradient transformation.

Matches the reference's vendored implementation (reference:radam.py:26-122)
exactly, including its quirks:
- rectification threshold N_sma >= 5; below it the update is the
  bias-corrected first moment with NO second-moment denominator
- denom = sqrt(exp_avg_sq) + eps (bias correction folded into step_size)
- weight decay applied decoupled, scaled by lr, BEFORE the main update

Implemented branchlessly (jnp.where) so it jits to one program.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RAdamState(NamedTuple):
    count: jnp.ndarray
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates


def radam(learning_rate, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    b1, b2 = betas

    def init_fn(params):
        return RAdamState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree.map(jnp.zeros_like, params),
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)

        exp_avg = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                               state.exp_avg, updates)
        exp_avg_sq = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                  state.exp_avg_sq, updates)

        beta2_t = b2 ** t
        n_sma_max = 2.0 / (1 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1 - beta2_t)

        bias1 = 1 - b1 ** t
        rect = jnp.sqrt(
            (1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
            * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2))
        step_rect = learning_rate * rect / bias1
        step_plain = learning_rate / bias1
        use_rect = n_sma >= 5.0

        def upd(m, v, p):
            rect_update = -step_rect * m / (jnp.sqrt(v) + eps)
            plain_update = -step_plain * m
            u = jnp.where(use_rect, rect_update, plain_update)
            if weight_decay != 0 and p is not None:
                u = u - weight_decay * learning_rate * p
            return u

        if params is None:
            new_updates = jax.tree.map(lambda m, v: upd(m, v, None),
                                       exp_avg, exp_avg_sq)
        else:
            new_updates = jax.tree.map(upd, exp_avg, exp_avg_sq, params)
        return new_updates, RAdamState(count, exp_avg, exp_avg_sq)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(optim_algo, learning_rate, weight_decay=0.0,
                    grad_clip_val=0.0):
    """Optimizer factory mirroring reference:train.py:230-239 + grad clip."""
    if optim_algo == "RAdam":
        opt = radam(learning_rate, weight_decay=weight_decay)
    elif optim_algo == "Adam":
        # torch Adam's weight_decay is L2 on the gradient (not decoupled)
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay
            else optax.identity(),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-learning_rate),
        )
    else:
        raise ValueError(f"Unrecognized optimizer {optim_algo!r}")

    if grad_clip_val and grad_clip_val > 0:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip_val), opt)
    return opt


def masked_optimizer(base, trainable_mask_tree):
    """Apply `base` to trainable leaves and FREEZE the rest.

    optax.masked alone is not freezing: masked-out leaves receive the
    raw incoming gradient as their "update" (they would drift by +grad
    every step). Chain a set_to_zero over the complement so frozen
    leaves (fixed-gaussian buffers, everything outside finetune_layers
    — reference:train.py:223-228, reference:flowtron.py:335-342) are
    bitwise untouched.
    """
    import jax
    frozen = jax.tree.map(lambda t: not t, trainable_mask_tree)
    return optax.chain(optax.masked(base, trainable_mask_tree),
                       optax.masked(optax.set_to_zero(), frozen))
