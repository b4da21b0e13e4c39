"""Multi-host helpers degrade gracefully to single-process."""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from effort_tpu.parallel.multihost import init_multihost, make_pod_mesh


def test_init_single_process_noop():
    pid, n = init_multihost()
    assert pid == 0 and n == 1


def test_pod_mesh_single_process():
    mesh = make_pod_mesh(("dp", "tp"), dcn_axes=(1,), ici_axes=(2, 4))
    assert mesh.shape == {"dp": 2, "tp": 4}

    # a psum over the mesh actually runs
    import jax.numpy as jnp
    from effort_tpu.parallel import shard_map

    def f(x):
        return jax.lax.psum(x, "tp")

    x = jnp.arange(8.0).reshape(2, 4)
    y = jax.jit(shard_map(f, mesh=mesh, in_specs=P("dp", "tp"),
                          out_specs=P("dp", None)))(x)
    np.testing.assert_allclose(np.asarray(y)[:, 0], [6.0, 22.0])
