"""SyncBN semantics: axis_name BN under shard_map == global-batch BN."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mmdet3d_gaussian_tpu.models.voxel_encoders import MaskedBatchNorm
from mmdet3d_gaussian_tpu.parallel.mesh import make_mesh


def test_syncbn_matches_global_bn():
    assert jax.device_count() >= 8
    mesh = make_mesh(8, ('data',))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 16).astype(np.float32) * 3 + 1)
    mask = jnp.asarray(rng.rand(64) > 0.2)

    bn_sync = MaskedBatchNorm(axis_name='data')
    bn_plain = MaskedBatchNorm()
    variables = bn_plain.init(jax.random.PRNGKey(0), x, mask=mask,
                              use_running_average=False)

    # global BN on the full batch
    want, _ = bn_plain.apply(variables, x, mask=mask,
                             use_running_average=False,
                             mutable=['batch_stats'])

    # sharded: each device sees 8 rows; psum-merged statistics
    def fn(v, xs, ms):
        out, _ = bn_sync.apply(v, xs, mask=ms, use_running_average=False,
                               mutable=['batch_stats'])
        return out

    got = jax.jit(jax.shard_map(fn, mesh=mesh,
                                in_specs=(P(), P('data'), P('data')),
                                out_specs=P('data')))(variables, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
