from effort_tpu.models.transformer import (  # noqa: F401
    ModelWeights, LayerWeights, init_random_weights, forward_token,
    make_kv_cache, quantize_head)
from effort_tpu.models.generate import generate, Engine  # noqa: F401
