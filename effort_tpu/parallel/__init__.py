from effort_tpu.parallel.tp import (  # noqa: F401
    make_mesh, make_tp_weights, tp_forward_token, tp_specs)
