from effort_tpu.convert.convert import (  # noqa: F401
    convert_checkpoint, HF_NAME_MAPS)
