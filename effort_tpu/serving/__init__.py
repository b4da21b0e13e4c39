from effort_tpu.serving.server import EffortServer, make_server  # noqa: F401
