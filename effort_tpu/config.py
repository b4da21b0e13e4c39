"""Configuration dataclasses.

The reference keeps its configuration as compile-time globals in main.swift
(stateDim/hiddenDim/goQ8/goQ4/numLayers/numExperts, main.swift:45-58) and
hard-codes kernel constants in Metal (#define numHeads 32, aux.metal:11-13).
Here everything is explicit, serializable dataclass config — the "Conf class"
the reference's author left as a TODO (main.swift:37-43).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass(frozen=True)
class BucketConfig:
    """Parameters of the bucketized weight format.

    Mirrors the semantics of the reference's conversion pipeline
    (convert.swift:209-331, convert.metal:43-119) with TPU-native layout
    choices:

      - bucket_size (B): contiguous output-column group whose elements are
        magnitude-sorted; rank-k of each bucket forms one "bucket row".
        Reference uses 16 (FP16) / 8 (Q8) because of Apple-GPU accumulator
        constraints (docs/gpu.html "Why buckets are sized 16"); on TPU the
        position-scatter costs ~3*B VPU ops per element so smaller B can win.
      - chunk_rows (G): input rows grouped into one DMA block; the gather
        kernel fetches (chunk, rank) blocks of shape [G, out/B].
      - probes (P): number of sampled (input-dim, weight) pairs used for the
        runtime cutoff quantile (reference hard-codes 4096,
        bucketMul.metal:141-247).
      - dtype: storage dtype of bucket values: "bf16", "int8", or "int4"
        (int4/int8 carry per-bucket-row scales; int4 additionally an FP32
        outlier list, mirroring bucketMulQ4.metal + q4_draft.py).
      - percent_load: fraction (0..1] of ranks actually loaded ("truncated
        weight loading", loader.swift:50,70,124 percentLoad/16); ranks
        >= ceil(percent_load*B) are dropped at load/convert time.
    """

    bucket_size: int = 4
    chunk_rows: int = 8
    probes: int = 4096
    dtype: str = "bf16"
    percent_load: float = 1.0
    # int4 only: top-|w| fraction kept as an exact fp32 table (the
    # reference's calcOutliers design, bucketMulQ4.metal:13-21). Default
    # OFF on TPU: the table's scatter-add costs milliseconds per matvec
    # and quantile-CLIPPED scales (clip_quantile) match its quality for
    # free (measured: clip 0.9935 vs absmax+0.5%-table 0.9933 cos at
    # effort=1 on w1-class weights).
    outlier_frac: float = 0.0
    clip_quantile: float = 0.99  # int4 scale rule: s = q-quantile(|w|)/7

    def __post_init__(self):
        # bucket_size 1 = row-prefix (MXU) layout: whole input rows are
        # the selection unit; no within-bucket positions (see
        # kernels/fused_stream.mxu_matvec)
        assert self.bucket_size in (1, 2, 4, 8, 16, 32), self.bucket_size
        assert self.dtype in ("bf16", "int8", "int4"), self.dtype
        assert 0.0 < self.percent_load <= 1.0

    @property
    def ranks_loaded(self) -> int:
        """Number of rank slices kept after truncated loading."""
        return max(1, int(round(self.percent_load * self.bucket_size)))


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Transformer architecture config (Llama/Mistral/Mixtral family)."""

    name: str = "mistral-7b"
    dim: int = 4096
    hidden_dim: int = 14336
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    head_dim: int = 128
    vocab_size: int = 32000
    norm_eps: float = 1e-5
    rope_theta: float = 1e6  # reference: logspace base 1e-6 -> theta 1e6
                             # (model.swift:693-717 createFreqsCis2)
    max_seq_len: int = 2048  # reference maxSeqLen (main.swift:76)
    # Sliding-window attention width (Mistral-7B: 4096). None = full
    # causal. The reference ignores SWA entirely — safe only because its
    # maxSeqLen (2048) never reaches the window; for contexts past the
    # window, matching the real Mistral checkpoint requires it.
    sliding_window: Optional[int] = None
    # MoE (Mixtral); n_experts=1 means dense FFN (reference loader.swift:178-227)
    n_experts: int = 1
    n_experts_per_tok: int = 2
    # Per-projection effort floors, e.g. {"wk": 0.45, "wv": 0.45}: the
    # projection's effective effort is max(effort, floor). K/V errors
    # persist in the cache and poison every later attention read, so
    # flooring the (cheap: ~7% of layer FLOPs at Mistral dims) wk/wv
    # muls buys disproportionate low-effort quality — the mitigation the
    # reference community discusses for its own quality breakdown
    # (docs/pesky.html). None/{} = uniform effort (reference behavior).
    effort_floors: Optional[dict] = None

    @property
    def is_moe(self) -> bool:
        return self.n_experts > 1

    @property
    def kv_repeats(self) -> int:
        return self.n_heads // self.n_kv_heads

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "ModelConfig":
        return ModelConfig(**json.loads(s))


def mistral_7b(**kw) -> ModelConfig:
    # sliding_window=4096 matches the HF checkpoint config; it only
    # changes anything when max_seq_len is raised past the window.
    return dataclasses.replace(
        ModelConfig(name="mistral-7b", sliding_window=4096), **kw)


def llama2_7b(**kw) -> ModelConfig:
    """Llama-2-7B: same decoder architecture as Mistral-7B with MHA
    (32 KV heads), 11008 FFN hidden, 4096 ctx, theta 1e4. The converter's
    mistral name map applies unchanged (HF uses identical tensor names)."""
    return dataclasses.replace(
        ModelConfig(name="llama2-7b", hidden_dim=11008, n_kv_heads=32,
                    rope_theta=1e4, max_seq_len=4096, vocab_size=32000),
        **kw,
    )


def llama3_8b(**kw) -> ModelConfig:
    """Llama-3-8B: Mistral-shaped decoder (GQA 32/8, 14336 FFN) with the
    128k-token vocabulary and rope_theta 5e5. HF tensor names are
    identical to Mistral's, so the converter's mistral map applies;
    `convert --model auto` also derives this config from config.json."""
    return dataclasses.replace(
        ModelConfig(name="llama3-8b", vocab_size=128256, rope_theta=5e5,
                    max_seq_len=4096),
        **kw,
    )


def mixtral_8x7b(**kw) -> ModelConfig:
    return dataclasses.replace(
        ModelConfig(name="mixtral-8x7b", n_experts=8, n_experts_per_tok=2,
                    rope_theta=1e6),
        **kw,
    )


def tiny_test_model(**kw) -> ModelConfig:
    """A reduced config for tests — the analog of the reference's practice of
    loading fewer layers/experts to iterate fast (main.swift:40-42,
    tester.swift:20-22 numLayers==10 golden mode)."""
    return dataclasses.replace(
        ModelConfig(
            name="tiny",
            dim=256,
            hidden_dim=512,
            n_layers=2,
            n_heads=4,
            n_kv_heads=2,
            head_dim=64,
            vocab_size=512,
            max_seq_len=128,
        ),
        **kw,
    )
