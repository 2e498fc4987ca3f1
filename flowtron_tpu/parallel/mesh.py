"""Device mesh + sharding helpers — the TPU replacement for the reference's
NCCL data parallelism (reference:distributed.py:22-133).

Where the reference hand-rolls gradient allreduce hooks, broadcast, and a
DistributedSampler, here a jax.sharding.Mesh + jit shardings express the
same thing declaratively: parameters replicated, batch sharded over the
'data' axis; XLA inserts the gradient psum over ICI/DCN automatically.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(dist_config):
    """Multi-host wiring: jax.distributed.initialize replaces the
    reference's NCCL TCP rendezvous (reference:distributed.py:28-44).

    dist_config keys (all optional):
      multiprocess: true -> initialize() with auto-detection (TPU pods)
      coordinator_address / num_processes / process_id -> explicit
        rendezvous, the moral equivalent of MASTER_ADDR/RANK/WORLD_SIZE
    Returns True when a multi-process runtime was initialized.
    """
    if dist_config.get("coordinator_address"):
        jax.distributed.initialize(
            coordinator_address=dist_config["coordinator_address"],
            num_processes=dist_config.get("num_processes"),
            process_id=dist_config.get("process_id"))
        return True
    if dist_config.get("multiprocess"):
        jax.distributed.initialize()
        return True
    return False


def coord_barrier(tag, timeout_s=600):
    """Cross-process barrier over the coordination service (an RPC, NOT
    a device collective) — safe to call from background threads such as
    the async checkpoint writer, where a device-collective barrier
    (multihost_utils.sync_global_devices) could interleave with
    concurrent train-step collectives and deadlock. No-op when
    single-process."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed
    client = getattr(distributed.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(f"flowtron_{tag}", timeout_s * 1000)
    else:  # pragma: no cover - no coordination service: last resort
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"flowtron_{tag}")


def make_mesh(mesh_shape=(-1,), axis_names=("data",), devices=None,
              dcn_mesh_shape=None):
    """Create a Mesh; a -1 dim absorbs all remaining devices.

    dcn_mesh_shape: per-axis process/slice counts for multi-slice
    deployments — the mesh is then laid out so the leading (data) axes
    cross DCN and the trailing (model) axes stay inside a slice on ICI
    (SURVEY §2.9: psum "over ICI (intra-slice) and DCN (multi-slice)").
    """
    if dcn_mesh_shape is not None:
        from jax.experimental import mesh_utils
        dev_array = mesh_utils.create_hybrid_device_mesh(
            tuple(mesh_shape), tuple(dcn_mesh_shape), devices=devices)
        return Mesh(dev_array, tuple(axis_names))
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = max(1, n // known)
    n_used = int(np.prod(shape))
    dev_array = np.asarray(devices[:n_used]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_axes(mesh, model_axis="model"):
    """Every mesh axis except the tensor-parallel one shards the batch
    (e.g. ('dcn', 'data') on a multi-slice 3-axis mesh)."""
    return tuple(a for a in mesh.axis_names if a != model_axis)


def batch_shard_size(mesh, model_axis="model"):
    return int(np.prod([dict(mesh.shape)[a]
                        for a in batch_axes(mesh, model_axis)] or [1]))


def data_sharded(mesh, axis=None):
    """Shard the leading (batch) axis over all non-model mesh axes."""
    if axis is None:
        axis = batch_axes(mesh)
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh, axis="data"):
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    sharding = data_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def param_shardings(params, mesh, model_axis="model", min_cols=8):
    """Tensor-parallel layout: shard the last axis of large 2-D weights
    over the model axis (GSPMD inserts the all-gathers/psums over ICI);
    everything else replicated. No-op P() tree when the mesh has no
    model axis.

    This generalizes the reference's replicated-weights data parallelism
    (reference:distributed.py) to 2-D (data x model) meshes.
    """
    if model_axis in mesh.axis_names:
        size = mesh.shape[model_axis]
    else:
        size = 1

    def spec(x):
        if (size > 1 and hasattr(x, "ndim") and x.ndim == 2
                and x.shape[1] % size == 0 and x.shape[1] >= min_cols):
            return NamedSharding(mesh, P(None, model_axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def place_params(params, mesh, model_axis="model"):
    """Device-put a param pytree according to param_shardings."""
    shardings = param_shardings(params, mesh, model_axis)
    return jax.tree.map(jax.device_put, params, shardings)
