"""Load a bucketized effort checkpoint into packed ModelWeights.

Counterpart of loader.swift (Model/Layer/ExpertWeights): reads the per-layer
tensors the converter wrote and stacks them into the packed per-projection
BucketedMatrix containers the scan-based forward pass uses
(models/transformer.py). Truncated loading (percent_load < 1) drops the
highest ranks at load time, like the reference's percentLoad row scaling
(loader.swift:50,70,124).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from effort_tpu.config import BucketConfig, ModelConfig
from effort_tpu.ops.layouts import BucketedMatrix, probe_sample_indices
from effort_tpu.models.transformer import LayerWeights, ModelWeights
from effort_tpu.runtime.safetensors_io import MultiShardReader


def load_config(ckpt_dir: str):
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        d = json.load(f)
    return (ModelConfig(**d["model"]), BucketConfig(**d["buckets"]))


def _bf16(reader: MultiShardReader, name: str) -> jnp.ndarray:
    # copy before the reader's mmap can go away: on the CPU backend
    # jnp.asarray may alias the numpy buffer zero-copy.
    bits = np.array(reader[name], copy=True)
    assert bits.dtype == np.uint16, name
    return jnp.asarray(bits).view(jnp.bfloat16)


def _arr(reader: MultiShardReader, name: str) -> jnp.ndarray:
    return jnp.asarray(np.array(reader[name], copy=True))


def _stack_bucketed(reader: MultiShardReader, prefixes: List[str],
                    cfg: ModelConfig, bcfg: BucketConfig,
                    percent_load: Optional[float] = None,
                    rows_sorted: bool = False,
                    load_core: bool = False,
                    out_dim: Optional[int] = None) -> BucketedMatrix:
    """Stack per-instance tensors (one per prefix) into one packed
    BucketedMatrix whose n_experts = len(prefixes).

    load_core=True reads the converter's optional `.core` dense copies
    (stored in the baked/permuted row order, convert.py store_core) into
    the `dense` field, enabling the effort=1.0 MXU path and dense
    prefill on LOADED checkpoints (the reference always has its `core`
    option, loader.swift:46-166). Only honored at full percent_load —
    a truncated bucket layout no longer matches the dense copy."""
    info = reader._reader(prefixes[0] + ".vals").info(prefixes[0] + ".vals")
    is_bf16 = info["dtype"] == "BF16"
    K_stored = None
    vals_l, pos_l, stats_l, probes_l, scales_l = [], [], [], [], []
    ov_l, oi_l, do_l, core_l = [], [], [], []
    load_core = (load_core
                 and (percent_load is None or percent_load >= 1.0)
                 and all(p + ".core" in reader for p in prefixes))
    for p in prefixes:
        v = (_bf16(reader, p + ".vals") if is_bf16
             else _arr(reader, p + ".vals"))
        vals_l.append(v)
        pos_l.append(_arr(reader, p + ".pos"))
        stats_l.append(_arr(reader, p + ".stats"))
        probes_l.append(_arr(reader, p + ".probes"))
        if p + ".scales" in reader:
            scales_l.append(_arr(reader, p + ".scales"))
        if p + ".outlier_vals" in reader:
            ov_l.append(_arr(reader, p + ".outlier_vals"))
            oi_l.append(_arr(reader, p + ".outlier_idx"))
        if p + ".seg_order" in reader:
            do_l.append(_arr(reader, p + ".seg_order"))
        if load_core:
            core_l.append(_bf16(reader, p + ".core"))

    stats = jnp.stack(stats_l)                     # [E, in, K_stored]
    E, in_dim, K_stored = stats.shape
    # chunk size is a per-matrix layout choice (B=1 picks it for ~3 MB
    # DMA tiles); recover it from the stored block shape
    G = vals_l[0].shape[1]
    NB_inst = vals_l[0].shape[0]
    OB = vals_l[0].shape[2]  # vals (not pos — pos is bit-packed)
    B = bcfg.bucket_size
    if out_dim is None:
        # int4 stores two values per byte (ops/bucketize nibble
        # packing), so the stored column count is out/2 — and padded to
        # a 128-byte multiple, so callers that know the projection's
        # true out_dim should pass it (the padding makes inversion from
        # shapes alone ambiguous)
        out_dim = OB * B * (2 if bcfg.dtype == "int4" else 1)
    assert NB_inst == (in_dim // G) * K_stored

    # truncated loading at load time
    K = K_stored
    if percent_load is not None and percent_load < 1.0:
        if B == 1 and not rows_sorted:
            pass     # see truncate_bucketed: unsorted rows stay whole
        elif B == 1:
            # row-prefix layout: drop the TRAILING (least-important,
            # calibration-sorted) row chunks — the input-dim analog of
            # the reference's percentLoad bucket-row truncation
            nc_keep = max(1, int(round(percent_load * (in_dim // G))))
            keep = np.zeros((K_stored, in_dim // G), bool)
            keep[:, :nc_keep] = True
            keep = keep.reshape(-1)
            vals_l = [v[keep] for v in vals_l]
            pos_l = [p[keep] for p in pos_l]
            stride = in_dim // probes_l[0].shape[0]
            in_dim = nc_keep * G
            stats = stats[:, :in_dim]
            scales_l = [s[:in_dim] for s in scales_l]
            # probes are an ascending strided dim sample: keep the prefix
            # that falls inside the kept rows
            probes_l = [p[:in_dim // stride] for p in probes_l]
        else:
            # keep only the first K ranks (rank-major block order)
            K = max(1, int(round(percent_load * K_stored)))
            keep = np.zeros((K_stored, in_dim // G), bool)
            keep[:K, :] = True
            keep = keep.reshape(-1)
            vals_l = [v[keep] for v in vals_l]
            pos_l = [p[keep] for p in pos_l]
            stats = stats[:, :, :K]
            scales_l = [s[:, :K] for s in scales_l]

    vals = jnp.concatenate(vals_l)                 # [E*NB, G, OB]
    pos = jnp.concatenate(pos_l)
    vals = jnp.concatenate([vals, jnp.zeros_like(vals[:1])])
    pos = jnp.concatenate([pos, jnp.zeros_like(pos[:1])])
    return BucketedMatrix(
        vals=vals, pos=pos, stats=stats,
        probes=jnp.stack(probes_l),
        probe_dims=jnp.asarray(
            probe_sample_indices(in_dim, out_dim, bcfg.probes)[:, 0]),
        scales=jnp.stack(scales_l) if scales_l else None,
        outlier_vals=jnp.stack(ov_l) if ov_l else None,
        outlier_idx=jnp.stack(oi_l) if oi_l else None,
        dense=jnp.stack(core_l) if core_l else None,
        seg_order=(jnp.stack(do_l) if do_l else None),
        in_dim=in_dim, out_dim=out_dim, bucket_size=B, chunk_rows=G,
        n_ranks=K, n_experts=E, dtype_name=bcfg.dtype,
        perm_segment=max(1, G // 4),
        rows_sorted=rows_sorted,
    )


def model_weight_bytes(cfg: ModelConfig, bcfg: BucketConfig,
                       percent_load: float = 1.0) -> int:
    """Estimated device bytes for a loaded model (weights only)."""
    # per-element upper bounds: vals + packed positions (+ int4's fp32
    # outlier table); per-row stats/scales/probes are negligible
    item = {"bf16": 2.25, "int8": 1.25, "int4": 1.0}[bcfg.dtype]
    L, E, dim, hid = cfg.n_layers, cfg.n_experts, cfg.dim, cfg.hidden_dim
    q_out = cfg.n_heads * cfg.head_dim
    kv_out = cfg.n_kv_heads * cfg.head_dim
    params = L * (dim * (q_out + 2 * kv_out) + q_out * dim
                  + E * 3 * dim * hid)
    return int(params * item * percent_load
               + 2 * 2 * cfg.vocab_size * dim)        # embeddings + head


def truncate_bucketed(bm: BucketedMatrix,
                      percent_load: float) -> BucketedMatrix:
    """In-memory truncated loading: the percentLoad semantics of
    _stack_bucketed applied to an already-built container (lets
    auto_percent_load degrade a model without re-reading the checkpoint;
    the reference can only choose percentLoad before loading,
    loader.swift:50).

    bucket_size == 1 (row-prefix): drop the TRAILING (least-important,
    calibration-sorted) row chunks. bucket_size > 1: keep the leading
    ranks. The dense copy is dropped (it no longer matches)."""
    import dataclasses
    if percent_load >= 1.0:
        return bm
    if bm.bucket_size == 1 and not bm.rows_sorted:
        # row-prefix truncation needs importance-sorted rows; an unsorted
        # matrix (wo) is kept whole rather than silently amputated
        return bm
    E, K, G = bm.n_experts, bm.n_ranks, bm.chunk_rows
    nc = bm.n_chunks
    zero_v, zero_p = bm.vals[-1:], bm.pos[-1:]
    # pos may be a placeholder with dummy trailing dims (bucket_size 1
    # stores no positions); reshape each by its own block shape
    vals = bm.vals[:-1].reshape((E, K, nc) + bm.vals.shape[1:])
    pos = bm.pos[:-1].reshape((E, K, nc) + bm.pos.shape[1:])
    stats, scales = bm.stats, bm.scales
    probes, probe_dims = bm.probes, bm.probe_dims
    in_dim, K_new = bm.in_dim, K
    ov, oi = bm.outlier_vals, bm.outlier_idx
    if bm.bucket_size == 1:
        nc_keep = max(1, int(round(percent_load * nc)))
        vals, pos = vals[:, :, :nc_keep], pos[:, :, :nc_keep]
        in_dim = nc_keep * G
        stats = stats[:, :in_dim]
        scales = scales[:, :in_dim] if scales is not None else None
        stride = bm.in_dim // probes.shape[1]
        probes = probes[:, :in_dim // stride]
        probe_dims = probe_dims[:in_dim // stride]
        if ov is not None:   # outliers on dropped rows contribute nothing
            ov = jnp.where(oi[:, :, 0] < in_dim, ov, 0.0)
    else:
        K_new = max(1, int(round(percent_load * K)))
        vals, pos = vals[:, :K_new], pos[:, :K_new]
        stats = stats[..., :K_new]
        scales = scales[..., :K_new] if scales is not None else None
    vals = jnp.concatenate([vals.reshape((-1,) + bm.vals.shape[1:]),
                            zero_v])
    pos = jnp.concatenate([pos.reshape((-1,) + bm.pos.shape[1:]), zero_p])
    return dataclasses.replace(
        bm, vals=vals, pos=pos, stats=stats, scales=scales, probes=probes,
        probe_dims=probe_dims, outlier_vals=ov, dense=None,
        in_dim=in_dim, n_ranks=K_new)


def truncate_model(w: ModelWeights, percent_load: float) -> ModelWeights:
    """Apply truncate_bucketed to every projection container (the
    runtime realization of autoAdjustPercent, loader.swift:316-339)."""
    import dataclasses
    layers = w.layers
    repl = {f: truncate_bucketed(getattr(layers, f), percent_load)
            for f in ("wq", "wk", "wv", "wo", "w1", "w2", "w3",
                      "wqkv", "w13")
            if getattr(layers, f) is not None}
    return dataclasses.replace(
        w, layers=dataclasses.replace(layers, **repl))


def auto_percent_load(cfg: ModelConfig, bcfg: BucketConfig,
                      hbm_budget_bytes: Optional[int] = None,
                      reserve_frac: float = 0.25) -> float:
    """TPU analog of the reference's autoAdjustPercent (loader.swift:
    316-339): pick the largest percent_load whose weights fit the HBM
    budget, leaving reserve_frac for KV cache + activations + compiler
    temps. The reference degrades to 11/16 on <=16 GB hosts; here the
    budget is the chip's actual HBM (or an explicit byte budget)."""
    if hbm_budget_bytes is None:
        import jax
        try:
            hbm_budget_bytes = jax.devices()[0].memory_stats()[
                "bytes_limit"]
        except Exception:
            hbm_budget_bytes = 16 * 2**30
    budget = int(hbm_budget_bytes * (1.0 - reserve_frac))
    # percent_load granularity mirrors the reference's 16ths
    for i in range(16, 0, -1):
        pl = i / 16.0
        if model_weight_bytes(cfg, bcfg, pl) <= budget:
            return pl
    return 1.0 / 16.0


def load_bucketized(ckpt_dir: str, percent_load: Optional[float] = None,
                    model: Optional[str] = None,
                    auto_adjust: bool = False,
                    load_dense="auto") -> tuple:
    """Returns (ModelWeights, ModelConfig, BucketConfig).

    auto_adjust=True (and no explicit percent_load): degrade
    percent_load so the weights fit the device HBM, like the reference's
    autoAdjustPercent RAM probe.

    load_dense: read the converter's `.core` dense copies (when stored)
    into each projection's `dense` field — effort=1.0 MXU decode + dense
    prefill on loaded checkpoints. "auto" loads them when they exist and
    buckets+dense together fit ~80% of device HBM; True forces (when
    stored); False skips. Ignored under truncated loading."""
    cfg, bcfg = load_config(ckpt_dir)
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        _cj = json.load(f)
    fused = bool(_cj.get("fused", False))
    calibrated = bool(_cj.get("calibrated", False))
    prof = _cj.get("activation_profile")
    if prof:
        # measured at convert time; the honest operating expectation for
        # this checkpoint (flat profiles stream ~every chunk under the
        # tau coverage bound: effort != speedup there — the int8 /
        # percent_load knobs are, QUALITY_trained.md §8)
        conc = max(prof.get("top25pct_mass_m", 0.0),
                   prof.get("top25pct_mass_f", 0.0))
        if conc < 0.40:
            import logging
            logging.getLogger("effort_tpu").info(
                "checkpoint activation profile is flat (top-25%% mass "
                "%.2f): effort buys quality-scaling, little decode "
                "speed at tau~1; for speed use int8 buckets and/or "
                "percent_load", conc)
    if auto_adjust and percent_load is None:
        percent_load = auto_percent_load(cfg, bcfg)
    r = MultiShardReader(ckpt_dir, model)
    L, E = cfg.n_layers, cfg.n_experts

    want_core = bool(load_dense)
    if load_dense == "auto" and (percent_load is None
                                 or percent_load >= 1.0):
        probe = ("layers.0.attention.wqkv.core" if fused
                 else "layers.0.attention.wq.core")
        if probe in r:
            try:
                import jax
                hbm = jax.devices()[0].memory_stats()["bytes_limit"]
            except Exception:
                hbm = 16 * 2**30
            import dataclasses as _dc
            dense_bytes = model_weight_bytes(
                cfg, _dc.replace(bcfg, dtype="bf16"))
            total = model_weight_bytes(cfg, bcfg) + dense_bytes
            want_core = total <= int(hbm * 0.8)
        else:
            want_core = False

    q_out = cfg.n_heads * cfg.head_dim
    kv_out = cfg.n_kv_heads * cfg.head_dim
    _OUT = {"wq": q_out, "wk": kv_out, "wv": kv_out, "wo": cfg.dim,
            "wqkv": q_out + 2 * kv_out, "w1": cfg.hidden_dim,
            "w3": cfg.hidden_dim, "w2": cfg.dim,
            "w13": 2 * cfg.hidden_dim}

    def attn(p):
        # wo's input space (attention output) is never calibration-sorted
        return _stack_bucketed(
            r, [f"layers.{l}.attention.{p}" for l in range(L)],
            cfg, bcfg, percent_load,
            rows_sorted=calibrated and p != "wo", load_core=want_core,
            out_dim=_OUT[p])

    def ffn(p):
        return _stack_bucketed(
            r, [f"layers.{l}.feed_forward.experts.{e}.{p}"
                for l in range(L) for e in range(E)],
            cfg, bcfg, percent_load, rows_sorted=calibrated,
            load_core=want_core, out_dim=_OUT[p])

    if fused:
        proj = dict(wq=None, wk=None, wv=None, w1=None, w3=None,
                    wqkv=attn("wqkv"), w13=ffn("w13"))
    else:
        proj = dict(wq=attn("wq"), wk=attn("wk"), wv=attn("wv"),
                    w1=ffn("w1"), w3=ffn("w3"))
    layers = LayerWeights(
        attn_norm=jnp.stack([jnp.asarray(np.array(r.get_f32(
            f"layers.{l}.attention_norm"))) for l in range(L)]),
        ffn_norm=jnp.stack([jnp.asarray(np.array(r.get_f32(
            f"layers.{l}.ffn_norm"))) for l in range(L)]),
        wo=attn("wo"), w2=ffn("w2"),
        ffn_gate=(jnp.stack([_bf16(r, f"layers.{l}.ffn_gate")
                             for l in range(L)]) if cfg.is_moe else None),
        **proj,
    )
    w = ModelWeights(
        tok_embeddings=_bf16(r, "tok_embeddings"),
        norm=jnp.asarray(np.array(r.get_f32("norm"))),
        output=_bf16(r, "output"),
        layers=layers,
    )
    r.close()
    return w, cfg, bcfg


def attach_dense_bucketed(bm: BucketedMatrix) -> BucketedMatrix:
    """Rebuild a bf16 dense copy from the buckets (permuted space) and
    attach it — the on-demand alternative to stored `.core` tensors for
    checkpoints converted without store_core. Exact up to quantization
    (int8/int4 reconstruct their dequantized values)."""
    import dataclasses
    if bm.dense is not None:
        return bm
    dense = jnp.stack([
        bm.reconstruct_dense(e, permuted_space=True).astype(jnp.bfloat16)
        for e in range(bm.n_experts)])
    return dataclasses.replace(bm, dense=dense)


def attach_dense(w: ModelWeights) -> ModelWeights:
    """attach_dense_bucketed over every projection container: gives a
    loaded model the effort=1.0 MXU decode path and dense prefill even
    when the checkpoint stored no `.core` copies. Costs one extra full
    bf16 weight set of HBM."""
    import dataclasses
    layers = w.layers
    repl = {f: attach_dense_bucketed(getattr(layers, f))
            for f in ("wq", "wk", "wv", "wo", "w1", "w2", "w3",
                      "wqkv", "w13")
            if getattr(layers, f) is not None}
    return dataclasses.replace(
        w, layers=dataclasses.replace(layers, **repl))
