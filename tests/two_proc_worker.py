"""Worker for tests/test_parallel.py::test_two_process_distributed_step.

Each of 2 processes owns 4 virtual CPU devices; together they form the 8-way
"data" mesh from cednerf_tpu.parallel and run one ray-sharded gradient step
(the multi-host story docs/PARALLELISM.md claims: jax.distributed init +
GSPMD psum across processes). Prints a digest of the updated params; the
test asserts both processes print the same digest.

Usage: two_proc_worker.py <coordinator_port> <process_id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

port, pid = int(sys.argv[1]), int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from cednerf_tpu.parallel import make_mesh  # noqa: E402

assert len(jax.devices()) == 8, jax.devices()
mesh = make_mesh()

# tiny "field": linear map; rays sharded on the data axis, params replicated
w = jnp.ones((4, 3)) * 0.1
rays_local = (np.arange(32 * 4, dtype=np.float32).reshape(32, 4) + 1.0) / 100.0
rays = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), rays_local
)  # global [64, 4], 8 shards of 8 rays
w = jax.device_put(w, NamedSharding(mesh, P()))


@jax.jit
def step(w, rays):
    def loss(w):
        pred = rays @ w
        return jnp.mean(pred**2)

    g = jax.grad(loss)(w)  # GSPMD inserts the cross-process psum
    return w - 0.5 * g


w2 = step(w, rays)
digest = float(jnp.sum(w2 * jnp.arange(w2.size).reshape(w2.shape)))
print(f"DIGEST {digest:.9e}", flush=True)
