"""Training subsystem (beyond the reference, which is inference-only):
train small Mistral-family models in-framework, export HF safetensors,
and feed the normal convert -> serve -> eval pipeline. Exists so the
effort-quality claims can be demonstrated on REAL trained margins in a
sandbox that ships no public checkpoints."""

from effort_tpu.train.trainer import (TrainConfig, byte_corpus_from_files,
                                      export_hf, forward, init_params,
                                      next_token_loss, train)

__all__ = ["TrainConfig", "byte_corpus_from_files", "export_hf",
           "forward", "init_params", "next_token_loss", "train"]
