"""Orbax checkpoint backend (train_config.checkpoint_format = "orbax").

Third on-disk format next to the pickle blob (checkpoints.py) and the
first-party sharded directory (sharded_ckpt.py), mapping the reference's
save/resume surface (reference:train.py:85-139) onto the TPU ecosystem's
standard checkpoint library: tensorstore/OCDBT storage, per-shard
parallel IO, async save, and sharding-aware restore driven by template
pytrees.

Layout:
  <dir>/state/        orbax StandardSave of {"params", "opt_state"}
  <dir>/meta.json     iteration / learning_rate / config / opt leaf kinds

meta.json doubles as the format marker: load_checkpoint dispatches a
directory to orbax when it exists (the first-party format's marker is
index.json).

Non-array optimizer leaves (python step counters etc.) are stored in
meta.json, not tensorstore, and re-inserted on restore so the optimizer
pytree round-trips exactly.
"""

import json
import os

import jax
import numpy as np


def _split_opt_leaves(opt_state):
    """-> (array-leaf list with None placeholders, {idx: python scalar})."""
    leaves = jax.tree_util.tree_leaves(opt_state)
    arrays, scalars = [], {}
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "shape"):
            arrays.append(leaf)
        else:
            arrays.append(None)
            scalars[str(i)] = leaf
    return arrays, scalars


def _checkpointer(use_async=False):
    import orbax.checkpoint as ocp
    if use_async:
        return ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return ocp.Checkpointer(ocp.StandardCheckpointHandler())


def _complete(path):
    return os.path.isdir(path) and \
        os.path.exists(os.path.join(path, "meta.json"))


def _heal_interrupted_swap(path):
    """A crash between finalize's two os.replace calls leaves the new
    checkpoint at <path>.ockpt_tmp (complete, meta.json written first)
    and/or the previous one at <path>.ockpt_old, with nothing at <path>.
    Complete the swap so a resume never silently restarts from scratch
    while a finished checkpoint sits on disk.

    Race-safe across processes: on a multi-host shared filesystem every
    process runs this at restore, so two can both see _complete(path)
    False and race os.replace — the loser's FileNotFoundError (or
    ENOTEMPTY against the winner's healed dir) is benign as long as the
    path is complete afterwards."""
    if _complete(path):
        return
    for cand in (path + ".ockpt_tmp", path + ".ockpt_old"):
        if _complete(cand):
            try:
                os.replace(cand, path)
            except OSError:
                pass  # another process won the race
            if _complete(path):
                return


def is_orbax_checkpoint(path):
    _heal_interrupted_swap(path)
    return _complete(path)


def save_orbax(dirpath, params, opt_state, iteration, learning_rate,
               config=None, use_async=False):
    """Write <dirpath>. Orbax makes the state write atomic (tmp dir +
    rename); meta.json — the format marker — is only written after the
    state is durable, so a half-written checkpoint is never detected as
    one.

    use_async=True returns (checkpointer, finalize) immediately after
    the device->host snapshot; the tensorstore write runs on orbax's
    background thread. The caller must wait_until_finished(), call
    finalize(), then close() (AsyncSaver does all three off-thread).
    """
    import orbax.checkpoint as ocp

    dirpath = os.path.abspath(dirpath)
    arrays, scalars = _split_opt_leaves(opt_state)
    state = {"params": params,
             "opt_arrays": [a for a in arrays if a is not None]}
    meta = {
        "version": 1,
        "iteration": int(iteration),
        "learning_rate": float(learning_rate),
        "config": config,
        "opt_scalars": scalars,
        "n_opt_leaves": len(arrays),
    }

    from flowtron_tpu.parallel.mesh import coord_barrier

    ckptr = _checkpointer(use_async)
    # write into a sibling tmp dir and only swap it in at finalize: the
    # previous checkpoint at this path must survive until the new one is
    # COMPLETE (deleting it up front + an async tensorstore write would
    # lose both on a crash mid-save). Multi-host: process 0 prepares the
    # tmp dir and later performs the swap; orbax coordinates the array
    # writes themselves across processes.
    import shutil
    workdir = dirpath + ".ockpt_tmp"
    if jax.process_index() == 0:
        if os.path.exists(workdir):
            shutil.rmtree(workdir)
        os.makedirs(workdir)
    coord_barrier("orbax_mkdir")
    ckptr.save(os.path.join(workdir, "state"),
               args=ocp.args.StandardSave(state))

    def finalize():
        # runs on the async waiter thread; filesystem swap is process-0
        # only (the races this avoids: concurrent rmtree/replace on a
        # shared path). Crash between the two os.replace calls leaves no
        # dir at dirpath — _heal_interrupted_swap on the restore side
        # completes the swap from .ockpt_tmp / .ockpt_old.
        if jax.process_index() != 0:
            coord_barrier("orbax_swap")
            return
        with open(os.path.join(workdir, "meta.json"), "w") as f:
            json.dump(meta, f)
        old = dirpath + ".ockpt_old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(dirpath):
            os.replace(dirpath, old)
        os.replace(workdir, dirpath)
        if os.path.exists(old):
            shutil.rmtree(old)
        coord_barrier("orbax_swap")

    if not use_async:
        if hasattr(ckptr, "wait_until_finished"):  # sync save blocks
            ckptr.wait_until_finished()
        finalize()
        ckptr.close()
        return None
    return ckptr, finalize


def restore_orbax(dirpath, params_template, opt_template=None):
    """Payload dict matching the pickle format. Template pytrees supply
    structure, dtypes, and — for sharded jax.Array leaves — the target
    shardings (orbax restores each device shard directly)."""
    import orbax.checkpoint as ocp

    dirpath = os.path.abspath(dirpath)
    with open(os.path.join(dirpath, "meta.json")) as f:
        meta = json.load(f)

    opt_arrays_t = []
    if opt_template is not None:
        leaves_t = jax.tree_util.tree_leaves(opt_template)
        if len(leaves_t) != meta["n_opt_leaves"]:
            raise ValueError(
                f"optimizer state mismatch: checkpoint has "
                f"{meta['n_opt_leaves']} leaves, template expects "
                f"{len(leaves_t)}")
        opt_arrays_t = [l for i, l in enumerate(leaves_t)
                        if str(i) not in meta["opt_scalars"]]

    template = {"params": params_template, "opt_arrays": opt_arrays_t}
    with _checkpointer() as ckptr:
        state = ckptr.restore(os.path.join(dirpath, "state"),
                              args=ocp.args.StandardRestore(template))

    opt_state = None
    if opt_template is not None:
        leaves, it = [], iter(state["opt_arrays"])
        for i in range(meta["n_opt_leaves"]):
            if str(i) in meta["opt_scalars"]:
                leaves.append(meta["opt_scalars"][str(i)])
            else:
                leaves.append(next(it))
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(opt_template), leaves)

    return {"params": state["params"], "opt_state": opt_state,
            "iteration": meta["iteration"],
            "learning_rate": meta["learning_rate"],
            "config": meta["config"]}


def restore_orbax_params_flat(dirpath):
    """{dotted name: np.ndarray} of just the params — the warmstart path
    (include_layers filtering happens on flat names, like both other
    formats)."""
    import orbax.checkpoint as ocp
    from flowtron_tpu.train.checkpoints import _flatten

    dirpath = os.path.abspath(dirpath)
    with _checkpointer() as ckptr:
        state = ckptr.restore(os.path.join(dirpath, "state"))
    params = jax.tree.map(np.asarray, state["params"])
    return _flatten(params)
