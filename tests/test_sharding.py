"""Sharding tests over the 8-virtual-device CPU mesh: param placement from
flax partitioning metadata, dp×tp train step, sharded generation, and the
graft-entry dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vlm_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
from vlm_tpu.parallel.sharding import shard_batch, shard_params, unbox


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh(data=4, model=2)


class TestMesh:
    def test_axis_sizes(self, mesh):
        assert mesh.shape[DATA_AXIS] == 4
        assert mesh.shape[MODEL_AXIS] == 2

    def test_all_remaining(self):
        m = make_mesh(data=-1, model=2)
        assert m.shape[DATA_AXIS] == 4

    def test_invalid_factorization(self):
        with pytest.raises(ValueError):
            make_mesh(data=3, model=2)


class TestParamSharding:
    def test_kernels_shard_over_model_axis(self, mesh):
        from vlm_tpu.models.configs import llava_config
        from vlm_tpu.models.vlm import init_vlm
        cfg = llava_config("test")
        module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32)
        sharded = shard_params(params, mesh)
        raw = unbox(sharded)
        qk = raw["params"]["decoder"]["block_0"]["attn"]["q_proj"]["kernel"]
        spec = qk.sharding.spec
        assert tuple(spec) == (None, MODEL_AXIS)
        # each model-shard holds half the output dim
        shard_shapes = {s.data.shape for s in qk.addressable_shards}
        assert shard_shapes == {(qk.shape[0], qk.shape[1] // 2)}
        # norms replicate
        ln = raw["params"]["decoder"]["block_0"]["input_norm"]["scale"]
        assert ln.sharding.spec == P()

    def test_batch_shards_over_data_axis(self, mesh):
        x = jnp.zeros((8, 16))
        sx = shard_batch(x, mesh)
        assert tuple(sx.sharding.spec) == (DATA_AXIS, None)

    def test_sharded_forward_matches_single_device(self, mesh):
        from vlm_tpu.models.configs import paligemma_config
        from vlm_tpu.models.vlm import init_vlm
        cfg = paligemma_config("test")
        module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32)
        s = cfg.vision.image_size
        px = jnp.asarray(np.random.default_rng(0).normal(size=(4, s, s, 3)),
                         jnp.float32)
        pre = jnp.ones((4, 2), jnp.int32)
        post = jnp.ones((4, 3), jnp.int32)
        ref = module.apply(params, px, pre, post)

        sp = shard_params(params, mesh)
        with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
            out = jax.jit(lambda p, a, b, c: module.apply(p, a, b, c))(
                sp, shard_batch(px, mesh), shard_batch(pre, mesh),
                shard_batch(post, mesh))
        assert float(jnp.abs(out - ref).max()) < 2e-3


class TestDryrun:
    def test_graft_entry_compiles(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.ndim == 3

    def test_dryrun_multichip_8(self, capsys):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "PASS" in out


class TestDistributed:
    def test_single_process_noop(self):
        from vlm_tpu.parallel.distributed import (initialize_multihost,
                                                  process_local_slice)
        initialize_multihost()          # no-op in-process
        start, size = process_local_slice(16)
        assert (start, size) == (0, 16)
