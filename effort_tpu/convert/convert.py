"""Offline conversion: HF-format safetensors -> bucketized effort checkpoint.

Counterpart of convert.swift:
  - name mapping per convertMistral (convert.swift:86-106) / convertMixtral
    (convert.swift:161-187), extended with the modern HF Mixtral names
    (block_sparse_moe.*) the reference predates.
  - per-matrix bucketization via ops/bucketize.py (the GPU pipeline of
    convert.swift:209-331 collapses into one jitted argsort program).
  - output: one safetensors shard set + index.json + config.json; per-layer
    tensors named <prefix>.{vals,pos,stats,probes,scales}; the loader
    (models/weights.py) stacks layers into packed BucketedMatrix containers.

Weights are stored TRANSPOSED ([in_dim, out_dim]) in bucket-block layout.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

import numpy as np

from effort_tpu.config import BucketConfig, ModelConfig
from effort_tpu.runtime.safetensors_io import (MultiShardReader,
                                               SafeTensorWriter)

# HF source name patterns per projection, {l}=layer, {e}=expert.
HF_NAME_MAPS = {
    "mistral": {
        "wq": "model.layers.{l}.self_attn.q_proj.weight",
        "wk": "model.layers.{l}.self_attn.k_proj.weight",
        "wv": "model.layers.{l}.self_attn.v_proj.weight",
        "wo": "model.layers.{l}.self_attn.o_proj.weight",
        "w1": "model.layers.{l}.mlp.gate_proj.weight",
        "w2": "model.layers.{l}.mlp.down_proj.weight",
        "w3": "model.layers.{l}.mlp.up_proj.weight",
        "attn_norm": "model.layers.{l}.input_layernorm.weight",
        "ffn_norm": "model.layers.{l}.post_attention_layernorm.weight",
        "norm": "model.norm.weight",
        "embed": "model.embed_tokens.weight",
        "lm_head": "lm_head.weight",
    },
    # Llama-2/3 use the same HF tensor names as Mistral
    "llama": None,   # alias, resolved below
    "mixtral": {
        "wq": "model.layers.{l}.self_attn.q_proj.weight",
        "wk": "model.layers.{l}.self_attn.k_proj.weight",
        "wv": "model.layers.{l}.self_attn.v_proj.weight",
        "wo": "model.layers.{l}.self_attn.o_proj.weight",
        "w1": "model.layers.{l}.block_sparse_moe.experts.{e}.w1.weight",
        "w2": "model.layers.{l}.block_sparse_moe.experts.{e}.w2.weight",
        "w3": "model.layers.{l}.block_sparse_moe.experts.{e}.w3.weight",
        "gate": "model.layers.{l}.block_sparse_moe.gate.weight",
        "attn_norm": "model.layers.{l}.input_layernorm.weight",
        "ffn_norm": "model.layers.{l}.post_attention_layernorm.weight",
        "norm": "model.norm.weight",
        "embed": "model.embed_tokens.weight",
        "lm_head": "lm_head.weight",
    },
}


def config_from_hf(src_dir: str,
                   max_seq_len: Optional[int] = None) -> ModelConfig:
    """Build a ModelConfig from the HF checkpoint's own config.json.

    The reference hard-codes every architecture constant in main.swift
    and its Metal #defines (stateDim/hiddenDim/numHeads/headDim,
    main.swift:45-77, aux.metal:11-13); HF checkpoints carry all of
    them, so `convert --model auto` just reads the source of truth.

    max_seq_len: KV caches are preallocated to this, so the HF
    max_position_embeddings (32768 for Mistral) is capped at 4096 by
    default; pass an explicit value for longer contexts (or use
    Engine(ring_kv=True), which is unbounded regardless).
    """
    with open(os.path.join(src_dir, "config.json")) as f:
        hf = json.load(f)
    n_heads = hf["num_attention_heads"]
    dim = hf["hidden_size"]
    return ModelConfig(
        name=hf.get("model_type", "hf-model"),
        dim=dim,
        hidden_dim=hf["intermediate_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=n_heads,
        n_kv_heads=hf.get("num_key_value_heads") or n_heads,
        head_dim=hf.get("head_dim") or dim // n_heads,
        vocab_size=hf["vocab_size"],
        norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 1e4),
        max_seq_len=(max_seq_len if max_seq_len is not None
                     else min(hf.get("max_position_embeddings", 2048),
                              4096)),
        sliding_window=hf.get("sliding_window"),
        n_experts=hf.get("num_local_experts", 1),
        n_experts_per_tok=hf.get("num_experts_per_tok", 2),
    )


def _to_bits_bf16(x) -> np.ndarray:
    """f32/bf16 jax array -> uint16 bf16 bit patterns (for storage)."""
    import jax.numpy as jnp
    x = np.asarray(jnp.asarray(x).astype(jnp.bfloat16))
    return x.view(np.uint16)


def _bucketize_and_store(writer: SafeTensorWriter, prefix: str,
                         w_hf: np.ndarray, bcfg: BucketConfig,
                         store_core: bool = False, act_rms=None,
                         in_perm=None, out_perm=None):
    """w_hf: HF layout [out_features, in_features]; bucketize its transpose.

    in_perm/out_perm: baked relayout permutations (see
    models/transformer.assemble_weights) — mutually exclusive with
    act_rms (runtime seg_order calibration)."""
    import dataclasses as _dc
    from effort_tpu.ops.bucketize import bucketize, pick_chunk_rows
    import jax.numpy as jnp
    wt = jnp.asarray(w_hf.T)                        # [in, out]
    bcfg = _dc.replace(bcfg, chunk_rows=pick_chunk_rows(
        bcfg, wt.shape[0], wt.shape[1]))
    bm = bucketize(wt, bcfg, act_rms=act_rms, in_perm=in_perm,
                   out_perm=out_perm)
    writer.add(prefix + ".vals",
               _to_bits_bf16(bm.vals[:-1]) if bm.dtype_name == "bf16"
               else np.asarray(bm.vals[:-1]),
               bf16_bits=bm.dtype_name == "bf16")
    writer.add(prefix + ".pos", np.asarray(bm.pos[:-1]))
    writer.add(prefix + ".stats", np.asarray(bm.stats[0]))
    writer.add(prefix + ".probes", np.asarray(bm.probes[0]))
    if bm.scales is not None:
        writer.add(prefix + ".scales", np.asarray(bm.scales[0]))
    if bm.outlier_vals is not None:
        writer.add(prefix + ".outlier_vals", np.asarray(bm.outlier_vals[0]))
        writer.add(prefix + ".outlier_idx", np.asarray(bm.outlier_idx[0]))
    if bm.seg_order is not None:
        writer.add(prefix + ".seg_order", np.asarray(bm.seg_order[0]))
    if store_core:
        # dense copy, like the reference's optional "core" tensors
        # (stored in the same baked row/col order as the buckets)
        wt_c = wt if out_perm is None else wt[:, jnp.asarray(out_perm)]
        if in_perm is not None:
            wt_c = wt_c[jnp.asarray(in_perm), :]
        writer.add(prefix + ".core", _to_bits_bf16(wt_c), bf16_bits=True)


def convert_checkpoint(src_dir: str, dst_dir: str, cfg: ModelConfig,
                       bcfg: BucketConfig, family: Optional[str] = None,
                       store_core: bool = False, calib: Optional[Dict] = None,
                       fuse: bool = False, progress=print) -> str:
    """Convert an HF checkpoint directory to the effort-tpu bucket format.

    calib: optional {"rms_m": [dim], "rms_f": [hidden]} activation
    calibration (from convert/calibrate.py collect_act_rms, or an .npz
    path) — runs the whole-model BAKED relayout during conversion: the
    residual and FFN-hidden spaces are permuted by descending rms and the
    permutations absorbed into the weights (embedding columns,
    projection input rows, producer output columns, norms, lm head), so
    the served model needs no runtime permute anywhere.

    fuse: bucketize CONCATENATED q|k|v and w1|w3 projections (stored as
    attention.wqkv / feed_forward.experts.{e}.w13) — one effort kernel
    launch + one shared selection each at serve time (LayerWeights.wqkv).
    """
    import numpy as _np
    family = family or ("mixtral" if cfg.is_moe else "mistral")
    if family == "llama":
        family = "mistral"          # identical HF tensor names
    names = HF_NAME_MAPS[family]
    src = MultiShardReader(src_dir)
    model_tag = f"buckets-{bcfg.dtype.upper()}"
    writer = SafeTensorWriter(dst_dir, model_tag)

    pi_m = pi_f = None
    if calib is not None:
        if isinstance(calib, str):
            calib = dict(_np.load(calib))
        pi_m = np.argsort(-np.asarray(calib["rms_m"])).astype(np.int32)
        if "rms_f" in calib:
            pi_f = np.argsort(-np.asarray(calib["rms_f"])).astype(np.int32)

    def permuted(x, perm, axis=0):
        return x if perm is None else np.take(np.asarray(x), perm, axis=axis)

    writer.add("norm", permuted(src.get_f32(names["norm"]), pi_m))
    writer.add("tok_embeddings",
               _to_bits_bf16(permuted(src.get_f32(names["embed"]), pi_m,
                                      axis=1)),
               bf16_bits=True)
    lm = names["lm_head"]
    if lm in src:
        out_w = src.get_f32(lm)
    else:  # tied embeddings
        out_w = src.get_f32(names["embed"])
    writer.add("output", _to_bits_bf16(permuted(out_w.T, pi_m)),
               bf16_bits=True)

    # baked perms per projection (models/transformer.assemble_weights):
    # in_perm: what this matrix's INPUT space was permuted by;
    # out_perm: the consumer space's permutation (this matrix produces it)
    proj_perms = {"wq": (pi_m, None), "wk": (pi_m, None),
                  "wv": (pi_m, None), "wo": (None, pi_m),
                  "w1": (pi_m, pi_f), "w3": (pi_m, pi_f),
                  "w2": (pi_f, pi_m)}

    for l in range(cfg.n_layers):
        progress(f"converting layer {l}/{cfg.n_layers}")
        pre = f"layers.{l}."
        writer.add(pre + "attention_norm",
                   permuted(src.get_f32(names["attn_norm"].format(l=l)),
                            pi_m))
        writer.add(pre + "ffn_norm",
                   permuted(src.get_f32(names["ffn_norm"].format(l=l)),
                            pi_m))
        if fuse:
            qkv = np.concatenate(
                [src.get_f32(names[p].format(l=l))
                 for p in ("wq", "wk", "wv")], axis=0)   # HF [out, in]
            _bucketize_and_store(writer, pre + "attention.wqkv", qkv,
                                 bcfg, store_core, in_perm=pi_m)
            attn_projs = ("wo",)
        else:
            attn_projs = ("wq", "wk", "wv", "wo")
        for p in attn_projs:
            ip, op = proj_perms[p]
            _bucketize_and_store(
                writer, pre + f"attention.{p}",
                src.get_f32(names[p].format(l=l)), bcfg, store_core,
                in_perm=ip, out_perm=op)
        # out_perm for the fused w1|w3: pi_f within each half
        pi_13 = (None if pi_f is None else
                 np.concatenate([pi_f, pi_f + cfg.hidden_dim]))

        def store_ffn(e: int, get):
            if fuse:
                w13 = np.concatenate([get("w1"), get("w3")], axis=0)
                _bucketize_and_store(
                    writer, pre + f"feed_forward.experts.{e}.w13", w13,
                    bcfg, store_core, in_perm=pi_m, out_perm=pi_13)
                ps = ("w2",)
            else:
                ps = ("w1", "w2", "w3")
            for p in ps:
                ip, op = proj_perms[p]
                _bucketize_and_store(
                    writer, pre + f"feed_forward.experts.{e}.{p}",
                    get(p), bcfg, store_core, in_perm=ip, out_perm=op)

        if cfg.is_moe:
            writer.add(pre + "ffn_gate",
                       _to_bits_bf16(permuted(
                           src.get_f32(names["gate"].format(l=l)).T, pi_m)),
                       bf16_bits=True)
            for e in range(cfg.n_experts):
                store_ffn(e, lambda p, e=e: src.get_f32(
                    names[p].format(l=l, e=e)))
        else:
            store_ffn(0, lambda p: src.get_f32(names[p].format(l=l)))
    writer.save()
    src.close()

    meta = {"model": dataclasses.asdict(cfg),
            "buckets": dataclasses.asdict(bcfg),
            "fused": fuse,
            "calibrated": calib is not None}
    if calib is not None:
        # store the measured activation-concentration profile: it is THE
        # predictor of this checkpoint's effort speedup (flat profiles
        # stream ~all chunks under the tau coverage bound — measured in
        # QUALITY_trained.md §8), so the loader can surface an honest
        # operating hint instead of letting users discover 1.0x dense
        # empirically
        def _conc(v):
            v = np.sort(np.asarray(v, np.float64))[::-1]
            return round(float(v[:len(v) // 4].sum()
                               / (v.sum() + 1e-30)), 4)
        meta["activation_profile"] = {
            "top25pct_mass_m": _conc(calib["rms_m"]),
            **({"top25pct_mass_f": _conc(calib["rms_f"])}
               if "rms_f" in calib else {}),
        }
    with open(os.path.join(dst_dir, "config.json"), "w") as f:
        json.dump(meta, f, indent=2)
    progress(f"saved {model_tag} to {dst_dir}")
    return model_tag
