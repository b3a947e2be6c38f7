"""Z-filter running statistics vs NumPy, including sharded merge."""

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.models.z_filter import (
    zfilter_init, zfilter_merge, zfilter_normalize, zfilter_std, zfilter_update,
)


def test_running_stats_match_numpy(rng):
    zf = zfilter_init(5)
    chunks = [rng.randn(100, 5).astype(np.float32) * (i + 1) + i for i in range(4)]
    for c in chunks:
        zf = zfilter_update(zf, jnp.array(c))
    allx = np.concatenate(chunks, 0)
    np.testing.assert_allclose(np.asarray(zf.mean), allx.mean(0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(zfilter_std(zf)), allx.std(0), rtol=1e-3, atol=1e-3)


def test_merge_equals_concat(rng):
    a_data = rng.randn(64, 3).astype(np.float32)
    b_data = (rng.randn(128, 3) * 2 + 5).astype(np.float32)
    a = zfilter_update(zfilter_init(3), jnp.array(a_data))
    b = zfilter_update(zfilter_init(3), jnp.array(b_data))
    merged = zfilter_merge(a, b)
    both = zfilter_update(zfilter_init(3), jnp.array(np.concatenate([a_data, b_data])))
    np.testing.assert_allclose(np.asarray(merged.mean), np.asarray(both.mean), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(merged.m2), np.asarray(both.m2), rtol=1e-3)


def test_axis_update_matches_global(rng):
    """shard_map'd update over the data axis == single global update."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    data = rng.randn(8, 32, 4).astype(np.float32)  # 8 shards
    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    zf0 = zfilter_init(4)

    def upd(z, x):
        return zfilter_update(z, x, axis_name="d")

    sharded = shard_map(
        upd, mesh=mesh,
        in_specs=(P(), P("d")),
        out_specs=P(),
    )
    zf_sharded = sharded(zf0, jnp.array(data))
    zf_global = zfilter_update(zf0, jnp.array(data.reshape(-1, 4)))
    np.testing.assert_allclose(np.asarray(zf_sharded.mean), np.asarray(zf_global.mean), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(zf_sharded.m2), np.asarray(zf_global.m2), rtol=1e-3, atol=1e-3)


def test_normalize_clips():
    zf = zfilter_update(zfilter_init(2), jnp.zeros((10, 2)) + jnp.array([[0.0, 1.0]]))
    out = zfilter_normalize(zf, jnp.array([1e6, -1e6]), clip=5.0)
    assert float(out[0]) == 5.0 and float(out[1]) == -5.0
