from effort_tpu.parallel.tp import (  # noqa: F401
    make_mesh, make_tp_weights, tp_forward_token, tp_specs)


def shard_map(f, mesh, in_specs, out_specs):
    """Version-compat shard_map: jax.shard_map (>=0.8, check_vma) when
    available, else jax.experimental.shard_map (check_rep). Replication
    checking is disabled either way — the bucketized weight containers
    carry unannotated replicated leaves (probes, scales) that the checker
    cannot infer."""
    try:
        from jax import shard_map as _sm
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)
