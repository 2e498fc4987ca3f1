"""Sharded (orbax-style) checkpoint format for TP/DP-sharded pytrees.

The pickle format (checkpoints.py) gathers every — possibly tensor-
parallel-sharded — parameter to one host array and serializes it in one
blob; fine at 40M params, not the scalable TPU-native answer (SURVEY §5:
"periodic async checkpoint (orbax-style)"). This module writes a
directory instead:

  <dir>/index.json              array metadata + shard index maps + scalars
  <dir>/<name>.<region>.npy     one file per distinct shard region

- save: the index covers the GLOBAL sharding; each process writes only
  the regions whose replica 0 it holds (region-keyed filenames, so
  multi-host writers never collide; shared filesystem assumed), process
  0 alone writes the index and swaps the directory in, with
  coordination-service barriers between phases (safe from the async
  writer thread). Restore verifies every element of every requested
  region is covered by a saved shard.
- restore: sharding-aware and lazy — when the target pytree leaf is a
  sharded jax.Array, jax.make_array_from_callback assembles each device
  shard from only the overlapping saved slices (memory-mapped reads), so
  no host ever materializes the full array.

Names in index.json are the checkpoints._flatten dotted paths, so the
warmstart / ignore_layers / finetune_layers filters (reference semantics,
reference:train.py:85-139) work identically on both formats.
"""

import json
import os
import shutil

import jax
import numpy as np

# dtypes numpy cannot serialize natively are viewed as a same-width
# integer type on disk
_VIEW_ON_DISK = {"bfloat16": np.uint16}


def _ml_dtype(name):
    if name in _VIEW_ON_DISK:
        import ml_dtypes
        return np.dtype(getattr(ml_dtypes, name))
    return np.dtype(name)


def _to_disk(arr):
    view = _VIEW_ON_DISK.get(str(arr.dtype))
    return arr.view(view) if view is not None else arr


def _from_disk(arr, dtype_name):
    view = _VIEW_ON_DISK.get(dtype_name)
    return arr.view(_ml_dtype(dtype_name)) if view is not None else arr


def _index_json(index, shape):
    """Tuple-of-slices shard index -> [[start, stop], ...]."""
    out = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        out.append([start, stop])
    return out


def _region_tag(idx):
    """[[start, stop], ...] -> filename-safe region key ("0-512.0-4096")."""
    return ".".join(f"{a}-{b}" for a, b in idx) or "scalar"


def _global_regions(x):
    """All distinct shard regions of a jax.Array across EVERY device
    (not just addressable ones) — the full index a restore needs."""
    seen, out = set(), []
    for idx in x.sharding.devices_indices_map(x.shape).values():
        j = _index_json(idx, x.shape)
        key = tuple(map(tuple, j))
        if key not in seen:
            seen.add(key)
            out.append(j)
    return out


def _owned_shards(x):
    """[(json_index, numpy_data)] for the shards THIS process writes:
    exactly the addressable shards with replica_id == 0, so on a
    multi-host run every distinct region is written by one process and
    writers never collide (single-process: replica 0 of every region is
    local, so this is simply the dedup)."""
    out = []
    for s in x.addressable_shards:
        if s.replica_id == 0:
            out.append((_index_json(s.index, x.shape), np.asarray(s.data)))
    return out


def _flat_leaves(params, opt_state):
    """(name, leaf) pairs for the whole checkpoint state."""
    from flowtron_tpu.train.checkpoints import _flatten
    items = list(_flatten(params).items())
    if opt_state is not None:
        leaves = jax.tree_util.tree_leaves(opt_state)
        items += [(f"opt.{i:05d}", leaf) for i, leaf in enumerate(leaves)]
    return items


# ---------------------------------------------------------------------------
# save
# ---------------------------------------------------------------------------

def snapshot(params, opt_state, iteration, learning_rate, config=None):
    """Device -> host snapshot (synchronous, cheap): returns a write plan
    {files: {relpath: np.ndarray}, index: dict} consumed by write_plan.
    Split out so AsyncSaver can run the disk write off-thread."""
    pidx = jax.process_index()
    files = {}
    arrays = {}
    for name, leaf in _flat_leaves(params, opt_state):
        if not hasattr(leaf, "shape"):      # python scalar leaf
            arrays[name] = {"scalar": leaf}
            continue
        safe = name.replace("/", "_")
        meta = {"shape": list(np.shape(leaf)), "dtype": str(leaf.dtype),
                "shards": []}
        if isinstance(leaf, jax.Array) and not leaf.is_fully_replicated:
            # index covers the GLOBAL sharding; this process writes only
            # the regions whose replica 0 it holds (files are keyed by
            # region, so multi-host writers never collide)
            regions = _global_regions(leaf)
            to_write = _owned_shards(leaf)
        else:
            shape = np.shape(leaf)
            regions = [_index_json((slice(None),) * len(shape), shape)]
            # replicated leaves are written by process 0 only — and only
            # process 0 pays the device->host transfer
            to_write = [(regions[0], np.asarray(leaf))] if pidx == 0 \
                else []
        for idx in regions:
            rel = f"{safe}.{_region_tag(idx)}.npy"
            meta["shards"].append({"file": rel, "index": idx})
        for idx, data in to_write:
            rel = f"{safe}.{_region_tag(idx)}.npy"
            files[rel] = _to_disk(np.ascontiguousarray(data))
        arrays[name] = meta

    index = {
        "version": 1,
        "iteration": int(iteration),
        "learning_rate": float(learning_rate),
        "config": config,
        "arrays": arrays,
    }
    return {"files": files, "index": index}


def write_plan(dirpath, plan):
    """Write a snapshot plan to <dirpath> atomically (tmp dir + rename).

    Multi-host protocol (shared filesystem assumed): process 0 creates
    the tmp dir and, after a barrier, every process writes its own
    region-keyed shard files (disjoint by construction — see
    _owned_shards); a second barrier, then process 0 alone writes the
    global index and performs the swap. Single-process runs take the
    same path with no barriers.
    """
    pidx = jax.process_index()

    def barrier(tag):
        # coordination-service barrier: write_plan runs on AsyncSaver's
        # background thread, where a device-collective barrier could
        # interleave with concurrent train-step collectives and deadlock
        from flowtron_tpu.parallel.mesh import coord_barrier
        coord_barrier(f"sharded_ckpt_{tag}")

    tmp = dirpath.rstrip("/") + ".tmp"
    if pidx == 0:
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
    barrier("mkdir")
    for rel, data in plan["files"].items():
        np.save(os.path.join(tmp, rel), data)
    barrier("shards")
    if pidx == 0:
        with open(os.path.join(tmp, "index.json"), "w") as f:
            json.dump(plan["index"], f)
        if os.path.exists(dirpath):
            shutil.rmtree(dirpath)
        os.replace(tmp, dirpath)
    barrier("swap")


def save_sharded(dirpath, params, opt_state, iteration, learning_rate,
                 config=None):
    write_plan(dirpath,
               snapshot(params, opt_state, iteration, learning_rate, config))


# ---------------------------------------------------------------------------
# restore
# ---------------------------------------------------------------------------

def _read_region(dirpath, meta, region):
    """Assemble one target region (list of [start, stop]) of an array from
    the overlapping saved shard files, via memory-mapped reads."""
    dtype = _ml_dtype(meta["dtype"])
    if not region:  # 0-d array: a single shard, no mmap slicing
        data = np.load(os.path.join(dirpath, meta["shards"][0]["file"]))
        return _from_disk(np.asarray(data), meta["dtype"]).reshape(())
    out = np.empty([b - a for a, b in region], dtype)
    covered = np.zeros(out.shape, bool)  # every element must be filled:
    # a gap means the checkpoint is missing shards (e.g. a partial
    # multi-host save) and np.empty garbage must never restore silently
    for sh in meta["shards"]:
        src = sh["index"]
        inter = [[max(a, c), min(b, d)] for (a, b), (c, d)
                 in zip(region, src)]
        if any(a >= b for a, b in inter):
            continue
        mm = np.load(os.path.join(dirpath, sh["file"]), mmap_mode="r")
        src_sl = tuple(slice(a - c, b - c)
                       for (a, b), (c, d) in zip(inter, src))
        dst_sl = tuple(slice(a - c, b - c)
                       for (a, b), (c, d) in zip(inter, region))
        out[dst_sl] = _from_disk(np.asarray(mm[src_sl]), meta["dtype"])
        covered[dst_sl] = True
    if not covered.all():
        raise ValueError(
            f"checkpoint shards do not cover region {region}: "
            f"{int((~covered).sum())} of {covered.size} elements missing "
            f"(incomplete or corrupted sharded checkpoint)")
    return out


def _read_array(dirpath, meta, like=None):
    """Read one array; sharded lazy path when `like` is a sharded
    jax.Array (each device shard reads only its own slices)."""
    shape = tuple(meta["shape"])
    full_region = [[0, d] for d in shape]
    if isinstance(like, jax.Array) and like.shape == shape \
            and not like.sharding.is_fully_replicated:
        def cb(idx):
            region = _index_json(idx, shape)
            return _read_region(dirpath, meta, region)
        return jax.make_array_from_callback(shape, like.sharding, cb)
    return _read_region(dirpath, meta, full_region)


def read_index(dirpath):
    with open(os.path.join(dirpath, "index.json")) as f:
        return json.load(f)


def restore_flat(dirpath, like_flat=None):
    """{flat name: array} for every array in the checkpoint (params and
    opt entries alike). like_flat optionally maps names to target arrays
    whose shardings drive lazy placement."""
    index = read_index(dirpath)
    out = {}
    for name, meta in index["arrays"].items():
        if "scalar" in meta:
            out[name] = meta["scalar"]
            continue
        like = (like_flat or {}).get(name)
        out[name] = _read_array(dirpath, meta, like)
    return out


def restore_sharded(dirpath, params_template, opt_template=None):
    """Payload dict matching the pickle format: {params, opt_state,
    iteration, learning_rate, config}. Template pytrees supply structure
    and (for sharded jax.Array leaves) target shardings."""
    from flowtron_tpu.train.checkpoints import _flatten, _unflatten

    index = read_index(dirpath)
    like_flat = dict(_flat_leaves(params_template, opt_template))
    flat = restore_flat(dirpath, like_flat)

    param_names = set(_flatten(params_template))
    params = _unflatten({k: v for k, v in flat.items()
                         if k in param_names}, params_template)

    opt_state = None
    if opt_template is not None:
        opt_names = sorted(k for k in index["arrays"] if k.startswith("opt."))
        leaves = [flat[k] for k in opt_names]
        treedef = jax.tree_util.tree_structure(opt_template)
        if treedef.num_leaves != len(leaves):
            raise ValueError(
                f"optimizer state mismatch: checkpoint has {len(leaves)} "
                f"leaves, template expects {treedef.num_leaves}")
        opt_state = jax.tree_util.tree_unflatten(treedef, leaves)

    return {"params": params, "opt_state": opt_state,
            "iteration": index["iteration"],
            "learning_rate": index["learning_rate"],
            "config": index["config"]}
