"""Multi-host integration runner — executed as REAL OS processes (one
per jax process) by tests/test_multihost.py.

Each invocation is one jax process of an N-process run over
N x devices_per_proc virtual CPU devices (gloo collectives between
processes — the CPU stand-in for ICI/DCN). Phases:

1. train `--steps` DP steps through the production building blocks
   (make_train_step donation, _device_batch's
   make_array_from_process_local_data, per-process data sharding).
   Dropout keys are withheld so losses are batch-order invariant and
   comparable against the single-process reference run.
2. validation loss (compute_validation_loss with mesh-divisible padding).
3. sharded-checkpoint save via AsyncSaver (region-keyed per-process
   writes + coord_barrier FROM THE WRITER THREAD) then cross-process
   restore into zeroed templates.
4. orbax checkpoint: async save (finalize barriers on the waiter
   thread, process-0-only swap) then restore.
5. grain loader epoch (multi-process sharded grain pipeline) with a
   SHARED mel disk cache directory — both processes race the cache
   (atomic writer in data/dataset.py).

Results are written to <workdir>/result_<nproc>proc_<pid>.json for the
test to assert on. Matches the reference's multi-process rendezvous role
(reference:distributed.py:28-44) under jax.distributed.
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--nproc", type=int, default=1)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    # platform setup BEFORE any jax-importing module (the container's
    # site hook pins JAX_PLATFORMS=axon; config.update overrides it)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count="
        f"{args.devices_per_proc}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    if args.nproc > 1:
        from flowtron_tpu.parallel.mesh import maybe_initialize_distributed
        assert maybe_initialize_distributed({
            "coordinator_address": f"localhost:{args.port}",
            "num_processes": args.nproc,
            "process_id": args.pid,
        })
    assert jax.process_count() == args.nproc
    assert len(jax.devices()) == args.nproc * args.devices_per_proc

    import numpy as np
    import jax.numpy as jnp
    from flowtron_tpu.models import flowtron_init
    from flowtron_tpu.parallel.mesh import make_mesh, coord_barrier
    from flowtron_tpu.train.loop import (
        make_train_step, make_eval_step, prepare_dataloaders,
        _device_batch, compute_validation_loss,
    )
    from flowtron_tpu.train.radam import build_optimizer, masked_optimizer
    from flowtron_tpu.train.checkpoints import (
        AsyncSaver, load_checkpoint, trainable_mask,
    )

    wd = args.workdir
    # n_mel_channels=80: the data pipeline's mel frontend is fixed at 80
    # bins (reference config.json:36); everything else tiny
    small = dict(n_speakers=2, n_speaker_dim=4, n_text=185, n_text_dim=8,
                 n_mel_channels=80, n_hidden=8, n_attn_channels=8,
                 n_lstm_layers=1, mel_encoder_n_hidden=8, n_flows=2,
                 use_gate_layer=True)
    data_config = {
        "training_files": os.path.join(wd, "filelist.txt"),
        "validation_files": os.path.join(wd, "filelist.txt"),
        "p_arpabet": 0.0, "cmudict_path": "", "heteronyms_path": "",
        "use_attn_prior": False, "sampling_rate": 22050,
        # SHARED cache dir: both processes race it on the first epoch
        "mel_cache_path": os.path.join(wd, "melcache"),
    }

    mesh = make_mesh((-1,), ("data",))
    params, static_cfg = flowtron_init(jax.random.PRNGKey(0), **small)
    mask = trainable_mask(params)
    opt = masked_optimizer(build_optimizer("RAdam", 1e-3, 0.0, 1.0), mask)
    opt_state = jax.jit(opt.init)(params)
    tc = {"sigma": 1.0, "gate_loss": True, "use_ctc_loss": True,
          "blank_logprob": -8}
    train_step = make_train_step(static_cfg, mesh, opt, tc)
    eval_step = make_eval_step(static_cfg, mesh, tc)

    result = {"process_count": jax.process_count(),
              "n_devices": len(jax.devices())}

    def run_steps(dc, n, params, opt_state):
        train_loader, val_loader = prepare_dataloaders(
            dict(dc), 8, seed=7, pad_to_multiple=8)
        losses, it = [], 0
        ctc_w = jnp.asarray(0.01, jnp.float32)
        while it < n:
            for batch in train_loader:
                b = _device_batch(batch, mesh)
                # dropout_key=None: deterministic, batch-order-invariant
                params, opt_state, m = train_step(params, opt_state, b,
                                                  None, ctc_w,
                                                  jnp.asarray(1.0))
                losses.append(float(m["loss"]))
                it += 1
                if it >= n:
                    break
        return losses, val_loader, params, opt_state

    losses, val_loader, params, opt_state = run_steps(
        data_config, args.steps, params, opt_state)
    result["train_losses"] = losses

    val, _ = compute_validation_loss(eval_step, params, val_loader, mesh,
                                     0.01)
    result["val"] = {k: float(v) for k, v in val.items()}

    def checksum(tree):
        tot = 0.0
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "shape"):
                tot += float(jnp.sum(jnp.abs(
                    jnp.asarray(leaf, jnp.float32))))
        return tot

    ck = checksum(params)
    result["param_checksum"] = ck

    # --- phase 3: sharded checkpoint through the async writer thread ---
    saver = AsyncSaver()
    sharded_path = os.path.join(wd, "ck_sharded")
    saver.save(sharded_path, params, opt_state, 7, 1e-3, fmt="sharded")
    saver.wait()
    coord_barrier("test_sharded_saved", 120)
    zeros = jax.tree.map(jnp.zeros_like, params)
    p2, o2, it2, _ = load_checkpoint(sharded_path, zeros, opt_state)
    result["sharded_restore_ok"] = bool(
        abs(checksum(p2) - ck) < 1e-3 and it2 == 7 and o2 is not None)

    # --- phase 4: orbax async save (waiter-thread finalize barriers) ---
    orbax_path = os.path.join(wd, "ck_orbax")
    saver.save(orbax_path, params, opt_state, 9, 1e-3, fmt="orbax")
    saver.wait()
    coord_barrier("test_orbax_saved", 120)
    p3, o3, it3, _ = load_checkpoint(orbax_path, zeros, opt_state)
    result["orbax_restore_ok"] = bool(
        abs(checksum(p3) - ck) < 1e-3 and it3 == 9 and o3 is not None)

    # --- phase 5: grain pipeline, multi-process sharded ---
    grain_dc = dict(data_config, use_grain=True)
    grain_losses, *_ = run_steps(grain_dc, 2, params, opt_state)
    result["grain_losses"] = grain_losses
    # both processes done loading before counting; exclude any .tmp.npy
    # a peer's atomic writer might still hold
    coord_barrier("test_cache_count", 120)
    result["mel_cache_files"] = len(
        [f for f in os.listdir(data_config["mel_cache_path"])
         if not f.endswith(".tmp.npy")])

    out = os.path.join(wd, f"result_{args.nproc}proc_{args.pid}.json")
    with open(out + ".tmp", "w") as f:
        json.dump(result, f)
    os.replace(out + ".tmp", out)
    print("RUNNER_DONE", args.pid, flush=True)


if __name__ == "__main__":
    main()
