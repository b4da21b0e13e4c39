"""Worker for the REAL 2-process multihost test (test_multihost_real).

Each process: joins the distributed runtime via init_multihost (the
module's core claim — exercised for real here, not just the
single-process degrade path), builds a (2-host DCN) x (4-device ICI)
pod mesh, and runs one tp-sharded decode-style matvec step whose psum
crosses both axes. Prints MH_OK <pid> on success; the parent asserts
both workers printed it.

Invoked: python tests/_mh_worker.py <coordinator> <n_procs> <proc_id>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax                                              # noqa: E402

# the axon TPU plugin grabs the backend regardless of JAX_PLATFORMS;
# only the in-process config wins (tests/conftest.py does the same)
jax.config.update("jax_platforms", "cpu")

import numpy as np                                      # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from effort_tpu.parallel import shard_map               # noqa: E402
from effort_tpu.parallel.multihost import (init_multihost,  # noqa: E402
                                           make_pod_mesh)


def main():
    coord, n_procs, pid = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    idx, cnt = init_multihost(coordinator_address=coord,
                              num_processes=n_procs, process_id=pid)
    assert idx == pid and cnt == n_procs, (idx, cnt)
    assert len(jax.devices()) == 4 * n_procs

    # dp spans hosts (DCN), tp spans each host's local devices (ICI)
    mesh = make_pod_mesh(("dp", "tp"), dcn_axes=(n_procs,),
                         ici_axes=(1, 4))
    assert mesh.shape == {"dp": n_procs, "tp": 4}

    # one decode-style step: column-parallel matvec, psum over tp,
    # batch over dp; then a scalar psum over BOTH axes (DCN + ICI)
    B, IN, OUT = 2 * n_procs, 32, 16
    rng = np.random.default_rng(0)
    Wf = rng.standard_normal((IN, OUT)).astype(np.float32)
    Xf = rng.standard_normal((B, IN)).astype(np.float32)

    w_sh = NamedSharding(mesh, P("tp", None))     # row-sharded weight
    x_sh = NamedSharding(mesh, P("dp", "tp"))     # batch + feature shards
    mk = jax.make_array_from_callback
    W = mk(Wf.shape, w_sh, lambda i: Wf[i])
    X = mk(Xf.shape, x_sh, lambda i: Xf[i])

    def step(w, x):
        y = jax.lax.psum(x @ w, "tp")             # [Bl, OUT] per dp shard
        tot = jax.lax.psum(jnp.sum(y), ("dp", "tp"))   # crosses DCN+ICI
        return y, tot

    y, tot = jax.jit(shard_map(
        step, mesh=mesh, in_specs=(P("tp", None), P("dp", "tp")),
        out_specs=(P("dp", None), P())))(W, X)

    want = Xf @ Wf
    shard = y.addressable_shards[0]
    rows = shard.index[0]
    np.testing.assert_allclose(np.asarray(shard.data), want[rows],
                               rtol=2e-5, atol=2e-5)
    # y is tp-replicated, so the (dp, tp) scalar psum counts each batch
    # row tp-many (4) times
    np.testing.assert_allclose(float(tot), 4 * want.sum(), rtol=2e-5)
    print(f"MH_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
