from effort_tpu.runtime.safetensors_io import (  # noqa: F401
    SafeTensorReader, SafeTensorWriter, MultiShardReader)
