"""Worker for the multi-process dp×tp GENERATION test.

Spawned 2× by tests/test_distributed_multiproc.py, each owning TWO virtual
CPU devices → a 4-device cluster meshed as (data=2, model=2) with the
MODEL (tensor-parallel) axis spanning the two processes — the deploy
topology for decoders too big for one host's chips. Runs:

1. a wave `GenerationEngine.generate` over a 4-image batch;
2. a `ContinuousBatcher.run` over 6 images (slot admission + chunked
   decode with cross-process collectives on every step);

and prints the generated tokens, which the parent asserts are identical
across processes AND to a single-process run of the same seeded model.

Usage: python distributed_gen_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("VLM_TPU_PALLAS_INTERPRET", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pathlib import Path  # noqa: E402

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from vlm_tpu.core.mesh import maybe_mesh  # noqa: E402
from vlm_tpu.parallel.distributed import initialize_multihost  # noqa: E402

initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert len(jax.local_devices()) == 2

# Devices arrive process-major: [p0d0, p0d1, p1d0, p1d1]. Transposing puts
# the MODEL axis across processes (each TP pair spans both hosts) and the
# DATA axis within a process.
devs = np.array(jax.devices()).reshape(nproc, 2).T
mesh = Mesh(devs, ("data", "model"))

from tests.gen_reference import build_case  # noqa: E402

case = build_case()
module, params, pixels_np, pre_np, post_np, plen_np = (
    case["module"], case["params"], case["pixels"], case["pre"],
    case["post"], case["plen"])


def to_global(tree):
    """Place a host-identical pytree on the global mesh (params keep their
    flax Partitioned specs; plain arrays replicate)."""
    import flax.linen as nn

    def place(x):
        if isinstance(x, nn.Partitioned):
            spec = P(*x.names)
            arr = np.asarray(x.unbox())
            sh = NamedSharding(mesh, spec)
            ga = jax.make_array_from_callback(
                arr.shape, sh, lambda idx, a=arr: a[idx])
            return x.replace_boxed(ga)
        arr = np.asarray(x)
        ga = jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh, P()),
            lambda idx, a=arr: a[idx])
        return ga
    return jax.tree.map(place, tree,
                        is_leaf=lambda x: isinstance(x, nn.Partitioned))


params = to_global(params)
pixels = jax.make_array_from_callback(
    pixels_np.shape, NamedSharding(mesh, P("data")),
    lambda idx: pixels_np[idx])

from vlm_tpu.generate.decode import GenerationEngine  # noqa: E402

engine = GenerationEngine(module, case["cfg"], batch_size=pixels_np.shape[0],
                          max_prompt_len=int(plen_np[0]),
                          max_new_tokens=case["max_new"],
                          cache_dtype=jnp.float32)
with maybe_mesh(mesh):
    res = engine.generate(params, pixels, pre_np, post_np, plen_np)
toks = np.asarray(multihost_utils.process_allgather(res.tokens,
                                                    tiled=True))
print("WAVE_TOKENS=" + ";".join(
    ",".join(str(int(t)) for t in row) for row in toks), flush=True)

# ---- continuous batcher under the cross-process mesh ----
from vlm_tpu.generate.batcher import ContinuousBatcher  # noqa: E402

batcher = ContinuousBatcher(module, case["cfg"],
                            batch_size=pixels_np.shape[0],
                            max_prompt_len=int(plen_np[0]),
                            max_new_tokens=case["max_new"],
                            cache_dtype=jnp.float32, mesh=mesh)
n_stream = case["n_stream"]


def pixel_fn(idxs):
    arr = pixels_np[[i % pixels_np.shape[0] for i in idxs]]
    return jax.make_array_from_callback(
        arr.shape, NamedSharding(mesh, P()), lambda idx: arr[idx])


with maybe_mesh(mesh):
    token_lists = batcher.run(
        params, pixel_fn,
        pre_ids_row=pre_np[0], post_ids_row=post_np[0],
        prompt_len_scalar=int(plen_np[0]), n_images=n_stream)
print("BATCH_TOKENS=" + ";".join(
    ",".join(str(t) for t in row) for row in token_lists), flush=True)
print("DONE", flush=True)
