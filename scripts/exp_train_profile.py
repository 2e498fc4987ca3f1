"""Where does the training step's time go? Ablation-based attribution
on the real TPU (profiler traces are awkward over the tunnel; timing
deltas between ablated steps attribute cost directly).

Variants at B=64/T=768 bf16 remat:
  full        — the real step (loss fwd+bwd+RAdam)
  no_ctc      — CTC loss off
  no_gate     — gate loss off too
  fwd_only    — loss value, no gradients
  one_flow    — n_flows=1 (halves the model)
  no_remat    — hoisted projections kept
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build(B, T, Tk, n_flows, tc, fwd_only=False):
    from flowtron_tpu.models import flowtron_init
    from flowtron_tpu.train.loop import make_train_step
    from flowtron_tpu.train.radam import radam, masked_optimizer
    from flowtron_tpu.train.checkpoints import trainable_mask
    from flowtron_tpu.parallel.mesh import make_mesh
    from flowtron_tpu.models import flowtron_forward
    from flowtron_tpu.train.loss import flowtron_loss

    dims = dict(n_speakers=1, n_speaker_dim=128, n_text=185, n_text_dim=512,
                n_mel_channels=80, n_hidden=1024, n_attn_channels=640,
                n_lstm_layers=2, mel_encoder_n_hidden=512)
    params, cfg = flowtron_init(jax.random.PRNGKey(0), n_flows=n_flows,
                                use_gate_layer=True, **dims)
    mesh = make_mesh()
    opt = masked_optimizer(radam(1e-4, weight_decay=1e-6),
                           trainable_mask(params, ()))
    opt_state = jax.jit(opt.init)(params)

    rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(rng.standard_normal((B, 80, T))
                           .astype(np.float32)),
        "speaker_ids": jnp.zeros((B,), jnp.int32),
        "text": jnp.asarray(rng.integers(1, 185, (B, Tk))),
        "in_lens": jnp.full((B,), Tk, jnp.int32),
        "out_lens": jnp.full((B,), T, jnp.int32),
        "gate_target": jnp.zeros((B, T), jnp.float32),
    }

    if fwd_only:
        @jax.jit
        def step(p, o, b, k, w, _prior_strength):
            out = flowtron_forward(
                p, cfg, b["mel"], b["speaker_ids"], b["text"],
                b["in_lens"], b["out_lens"], train=True, dropout_key=k,
                compute_dtype=jnp.bfloat16,
                remat_scans=bool(tc.get("remat")))
            nll, gate, ctc = flowtron_loss(
                out, b["gate_target"], b["in_lens"], b["out_lens"],
                sigma=1.0, gm_loss=False,
                gate_loss=bool(tc.get("gate_loss", True)),
                use_ctc_loss=bool(tc.get("use_ctc_loss")),
                blank_logprob=-1)
            return p, o, {"loss": nll + gate + ctc * w}
    else:
        from flowtron_tpu.train.loop import make_train_step
        step = make_train_step(cfg, mesh, opt, tc)
    return step, params, opt_state, batch


def run(name, B=64, T=768, Tk=128, n_flows=2, fwd_only=False, **tc_over):
    tc = {"sigma": 1.0, "fp16_run": True, "use_ctc_loss": True,
          "remat": True, "gate_loss": True}
    tc.update(tc_over)
    step, params, opt_state, batch = build(B, T, Tk, n_flows, tc, fwd_only)
    p = jax.tree.map(jnp.copy, params)
    o = jax.tree.map(lambda x: jnp.copy(x) if hasattr(x, "dtype") else x,
                     opt_state)
    key = jax.random.PRNGKey(0)
    try:
        p, o, m = step(p, o, batch, key, jnp.asarray(0.01), jnp.asarray(1.0))
        float(m["loss"])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            p, o, m = step(p, o, batch, key, jnp.asarray(0.01), jnp.asarray(1.0))
            float(m["loss"])
            times.append(time.perf_counter() - t0)
        print(f"{name:12s}: {min(times)*1e3:7.1f} ms/step", flush=True)
    except Exception as e:
        print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["full", "no_ctc", "no_gate", "fwd_only",
                             "one_flow", "no_remat"]
    if "full" in which:
        run("full")
    if "no_ctc" in which:
        run("no_ctc", use_ctc_loss=False)
    if "no_gate" in which:
        run("no_gate", use_ctc_loss=False, gate_loss=False)
    if "fwd_only" in which:
        run("fwd_only", fwd_only=True)
    if "one_flow" in which:
        run("one_flow", n_flows=1)
    if "no_remat" in which:
        run("no_remat", remat=False)
