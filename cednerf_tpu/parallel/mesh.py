"""Ray-sharded data parallelism over a device mesh.

The reference is strictly single-GPU (SURVEY §2c: no torch.distributed /
NCCL anywhere), so scale-out is a new TPU-native design, not a port:

  * 1-D mesh over ICI, axis "data";
  * ray batches sharded along axis 0; parameters, optimizer state, and the
    occupancy grid replicated;
  * gradients all-reduced by XLA (GSPMD inserts the psum when the jitted
    train step consumes sharded rays and produces replicated parameter
    updates) — no hand-written collectives needed for the DP axis;
  * occupancy updates run replicated (identical inputs + keys on every
    device), keeping the grids bitwise identical without communication.

Multi-host pods follow standard jax.distributed initialization; nothing here
assumes a single process.
"""

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard every leaf along axis 0 (rays) across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    scalar = NamedSharding(mesh, P())

    def put(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % mesh.size == 0:
            return jax.device_put(x, sharding)
        return jax.device_put(x, scalar)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate every leaf across the mesh (params, opt state, occ grid)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
