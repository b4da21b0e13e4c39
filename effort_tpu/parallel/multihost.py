"""Multi-host runtime: process initialization + DCN/ICI-aware meshes.

Green-field relative to the reference (strictly one process, SURVEY §2.3
"Multi-process / multi-host: Absent"). Two pieces:

  - init_multihost(): wraps jax.distributed.initialize so every host in a
    pod slice joins one JAX runtime (coordinator discovery via explicit
    args or the TPU environment's auto-detection);
  - make_pod_mesh(): builds a mesh whose FIRST axes span hosts (traffic
    rides DCN) and whose LAST axes stay inside each host's slice (traffic
    rides ICI). Axis placement is the whole performance story across
    hosts: put dp/pp on DCN axes (one activation hop or gradient-free
    inference traffic) and tp/sp/ep on ICI axes (per-layer collectives).

Everything degrades gracefully to single-process so the same entry points
work in tests and on one chip.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> Tuple[int, int]:
    """Join (or create) the multi-host JAX runtime.

    With no arguments on a TPU pod slice, jax.distributed.initialize
    auto-detects everything from the TPU metadata environment. Returns
    (process_index, process_count). Safe to call in single-process runs:
    initialization is skipped when there is nothing to join."""
    if num_processes is not None and num_processes > 1 or \
            coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_index(), jax.process_count()


def make_pod_mesh(axis_names: Sequence[str] = ("dp", "tp"),
                  dcn_axes: Sequence[int] = (1,),
                  ici_axes: Optional[Sequence[int]] = None,
                  devices=None) -> Mesh:
    """Mesh over all processes' devices with host-major ordering.

    dcn_axes[i] is the size of axis_names[i] ACROSS hosts (product must
    equal jax.process_count()); ici_axes are the within-host axis sizes
    (product must equal per-host device count; inferred for the last axis
    when omitted). Single-process: dcn_axes of all 1s works as a plain
    local mesh."""
    devices = devices if devices is not None else jax.devices()
    n_local = len(devices) // max(1, jax.process_count())
    n_hosts = jax.process_count()

    dcn = list(dcn_axes) + [1] * (len(axis_names) - len(dcn_axes))
    assert int(np.prod(dcn)) in (n_hosts, 1), (dcn, n_hosts)
    if ici_axes is None:
        # all local devices on the last (innermost, ICI) axis
        ici = [1] * (len(axis_names) - 1) + [n_local]
    else:
        ici = list(ici_axes)
    assert len(ici) == len(axis_names), \
        f"ici_axes must give one factor per axis name: {ici} {axis_names}"
    assert int(np.prod(ici)) == n_local, (ici, n_local)

    if n_hosts > 1:
        from jax.experimental import mesh_utils
        shape = tuple(d * i for d, i in zip(dcn, ici))
        # The DCN granule is the ICI slice on multi-slice TPU pods; on
        # CPU/GPU multi-process runtimes (and single-slice pods) every
        # device reports slice_index 0, so fall back to process granules
        # whenever the slice count can't satisfy the requested DCN shape
        # (this is the path the 2-process localhost test exercises)
        n_slices = len({getattr(d, "slice_index", 0) for d in devices})
        by_process = n_slices != int(np.prod(dcn))
        dev_array = mesh_utils.create_hybrid_device_mesh(
            ici, dcn, devices=devices, process_is_granule=by_process)
        return Mesh(dev_array.reshape(shape), tuple(axis_names))
    shape = tuple(d * i for d, i in zip(dcn, ici))
    assert int(np.prod(shape)) <= len(devices)
    arr = np.asarray(devices[:int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, tuple(axis_names))
