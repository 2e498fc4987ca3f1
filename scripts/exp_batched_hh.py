"""Study: batch the decoder's three recurrent h@W_hh dots into one
stacked einsum at serving batch sizes (ROADMAP round-3 candidate 5b,
"double-layer decoder matmul fusion at B>=128").

The inference scan cell (models/ar_step.py:262-314) runs, per step:

    att:  prev_out@W_ih_a (80xK, tiny) ; h_att@W_hh_a (1024x4096)
    attn: query/scores (1024x640 + score reduce)
    l0:   x0@W_ih_0 (1664x4096)        ; h0@W_hh_0   (1024x4096)
    l1:   x1@W_ih_1 (1024x4096)        ; h1@W_hh_1   (1024x4096)
    out:  dense (1024x1024) + proj (1024x160)

The three W_hh dots consume state carried from the PREVIOUS step, so
they are all computable at step start — candidate for one batched
einsum (3,B,1024)x(3,1024,4096) instead of three serial dots, saving
two per-dot fixed overheads per step on the serial MXU.

This microbench replicates the cell's dot chain with the real data
dependencies (each x_i derives from the previous dot's output so XLA
cannot dead-code or reorder across them) and times N scan steps as one
device dispatch, both ways, at several batch sizes.

Run: python scripts/exp_batched_hh.py  (real TPU; bf16)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, A, MEL = 1024, 640, 80
DT = jnp.bfloat16
N_STEPS = 400


def make_weights(key):
    ks = jax.random.split(key, 10)
    s = 0.02
    return {
        "w_ih_a": jax.random.normal(ks[0], (MEL, 4 * H), DT) * s,
        "w_hh": jnp.stack([
            jax.random.normal(ks[1], (H, 4 * H), DT) * s,   # att
            jax.random.normal(ks[2], (H, 4 * H), DT) * s,   # l0
            jax.random.normal(ks[3], (H, 4 * H), DT) * s,   # l1
        ]),
        "w_q": jax.random.normal(ks[4], (H, A), DT) * s,
        "w_ih_0": jax.random.normal(ks[5], (H + A, 4 * H), DT) * s,
        "w_ih_1": jax.random.normal(ks[6], (H, 4 * H), DT) * s,
        "w_dense": jax.random.normal(ks[7], (H, H), DT) * s,
        "w_out": jax.random.normal(ks[8], (H, 2 * MEL), DT) * s,
        "vals": jax.random.normal(ks[9], (128, A), DT) * s,  # Tk=128 values
    }


def gates_combine(z, h, c):
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    return jax.nn.sigmoid(o) * jnp.tanh(c), c


def make_step(w, batched):
    def step(carry, _):
        h_att, c_att, h0, c0, h1, c1, prev = carry
        if batched:
            hh = jnp.einsum("lbh,lhk->lbk", jnp.stack([h_att, h0, h1]),
                            w["w_hh"])
            hh_a, hh_0, hh_1 = hh[0], hh[1], hh[2]
        else:
            hh_a = h_att @ w["w_hh"][0]
        h_att, c_att = gates_combine(prev @ w["w_ih_a"] + hh_a, h_att, c_att)
        q = h_att @ w["w_q"]
        scores = q @ w["vals"].T                      # (B, Tk)
        ctx = jax.nn.softmax(scores, axis=-1) @ w["vals"]
        x0 = jnp.concatenate([h_att, ctx], axis=-1)
        if not batched:
            hh_0 = h0 @ w["w_hh"][1]
        h0, c0 = gates_combine(x0 @ w["w_ih_0"] + hh_0, h0, c0)
        if not batched:
            hh_1 = h1 @ w["w_hh"][2]
        h1, c1 = gates_combine(h0 @ w["w_ih_1"] + hh_1, h1, c1)
        out = jnp.tanh(h1 @ w["w_dense"]) @ w["w_out"]
        prev = out[:, :MEL]
        return (h_att, c_att, h0, c0, h1, c1, prev), ()

    return step


def run(w, B, batched, n_steps=N_STEPS):
    step = make_step(w, batched)

    @jax.jit
    def scan(carry):
        carry, _ = jax.lax.scan(step, carry, None, length=n_steps)
        return carry

    z = lambda: jnp.zeros((B, H), DT)
    carry = (z(), z(), z(), z(), z(), z(),
             jnp.zeros((B, MEL), DT))
    # warm (compile)
    float(scan(carry)[0].sum())
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(scan(carry)[0].sum())
        best = min(best, time.perf_counter() - t0)
    return best / n_steps * 1e6  # us/step


def main():
    print(f"backend: {jax.default_backend()}")
    w = make_weights(jax.random.PRNGKey(0))
    for B in (1, 8, 64, 128, 256):
        serial = run(w, B, batched=False)
        fused = run(w, B, batched=True)
        print(f"B={B:4d}: serial {serial:7.2f} us/step | "
              f"batched-hh {fused:7.2f} us/step | "
              f"delta {100 * (serial - fused) / serial:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
