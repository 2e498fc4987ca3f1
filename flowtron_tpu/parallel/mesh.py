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


def make_mesh(mesh_shape=(-1,), axis_names=("data",), devices=None):
    """Create a Mesh; a -1 dim absorbs all remaining devices."""
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


def data_sharded(mesh, axis="data"):
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh, axis="data"):
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    sharding = data_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
