"""effort-tpu: a TPU-native LLM inference engine with runtime-adjustable effort.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of kolinko/effort
(reference: Swift+Metal "Effort Engine", see /root/reference and SURVEY.md):
approximate vector-matrix multiplication where the fraction of multiplications
actually performed ("effort", 0-100%) is adjustable at runtime per call.

Key subsystems:
  - ops:       bucketized weight format, effort selection, bucketMul math
  - kernels:   Pallas TPU kernels (gather bucketMul, attention)
  - models:    transformer forward (Mistral / Mixtral MoE), generation loop
  - convert:   offline HF-safetensors -> bucketed-checkpoint conversion
  - parallel:  mesh / sharding (TP, DP, EP) over jax.sharding
  - runtime:   safetensors IO (C++ mmap + python), tokenizer (C++ BPE + python)
  - serving:   HTTP server + batching scheduler
  - eval:      quality/perf harness (cos-sim sweeps, agreement, QA quiz)
"""

import os

__version__ = "0.1.0"

# Persistent compilation cache: full-model decode graphs are large; caching
# across processes makes reruns/benchmarks start in seconds instead of minutes.
if os.environ.get("EFFORT_TPU_NO_COMPILE_CACHE", "") != "1":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/effort_tpu_jax_cache")

from effort_tpu.config import BucketConfig, ModelConfig  # noqa: E402,F401
