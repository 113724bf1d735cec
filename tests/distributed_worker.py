"""Worker process for the multi-process distributed test.

Spawned N times by tests/test_distributed_multiproc.py. Each process owns one
virtual CPU device, joins the cluster via
``vlm_tpu.parallel.distributed.initialize_multihost``, feeds its
``process_local_slice`` of a global batch, and runs one data-parallel
train step of a linear probe head. The loss is computed over the GLOBAL
batch by XLA collectives (Gloo between processes), so every process must
print the identical value — which the parent asserts, together with a
single-process reference value.

Usage: python distributed_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pathlib import Path  # noqa: E402

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from vlm_tpu.parallel.distributed import (initialize_multihost,  # noqa: E402
                                          process_local_slice)

initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()

GLOBAL_BATCH = 8
DIM = 16
CLASSES = 4

# Global dataset is seeded identically everywhere; each process decodes only
# its slice (the multi-host feeding pattern).
rng = np.random.default_rng(0)
x_all = rng.normal(0, 1, (GLOBAL_BATCH, DIM)).astype(np.float32)
y_all = rng.integers(0, CLASSES, (GLOBAL_BATCH,)).astype(np.int32)
start, size = process_local_slice(GLOBAL_BATCH)

mesh = Mesh(np.array(jax.devices()).reshape(nproc), ("data",))
xsh = NamedSharding(mesh, P("data"))
x = jax.make_array_from_process_local_data(xsh, x_all[start:start + size],
                                           (GLOBAL_BATCH, DIM))
y = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), y_all[start:start + size],
    (GLOBAL_BATCH,))

w = jax.device_put(
    jnp.asarray(np.random.default_rng(1).normal(0, 0.1, (DIM, CLASSES)),
                jnp.float32),
    NamedSharding(mesh, P()))                    # replicated params
tx = optax.adamw(1e-2)
opt_state = tx.init(w)


def loss_fn(w, x, y):
    logits = x @ w
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))


@jax.jit
def step(w, opt_state, x, y):
    loss, grads = jax.value_and_grad(loss_fn)(w, x, y)
    updates, opt_state = tx.update(grads, opt_state, w)
    return optax.apply_updates(w, updates), opt_state, loss


w, opt_state, loss = step(w, opt_state, x, y)
w2, _, loss2 = step(w, opt_state, x, y)
print(f"LOSS0={float(loss):.8f}", flush=True)
print(f"LOSS1={float(loss2):.8f}", flush=True)
print(f"SLICE={start}:{start + size}", flush=True)
print("DONE", flush=True)
