"""HF checkpoint -> bucketized checkpoint -> loaded model, end to end."""

import numpy as np
import jax.numpy as jnp
import pytest

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.convert.convert import convert_checkpoint, HF_NAME_MAPS
from effort_tpu.models.weights import load_bucketized
from effort_tpu.models.transformer import forward_token, make_kv_cache
from effort_tpu.runtime.safetensors_io import SafeTensorWriter
from effort_tpu.ops.bucketmul import dense_matvec


def _write_hf_ckpt(d, cfg, rng, family="mistral"):
    names = HF_NAME_MAPS[family]
    w = SafeTensorWriter(str(d), "model")
    dims = {
        "wq": (cfg.n_heads * cfg.head_dim, cfg.dim),
        "wk": (cfg.n_kv_heads * cfg.head_dim, cfg.dim),
        "wv": (cfg.n_kv_heads * cfg.head_dim, cfg.dim),
        "wo": (cfg.dim, cfg.n_heads * cfg.head_dim),
        "w1": (cfg.hidden_dim, cfg.dim),
        "w2": (cfg.dim, cfg.hidden_dim),
        "w3": (cfg.hidden_dim, cfg.dim),
    }
    tensors = {}

    def add(name, shape):
        t = (rng.standard_normal(shape) * 0.02).astype(np.float32)
        w.add(name, t)
        tensors[name] = t

    add(names["norm"], (cfg.dim,))
    add(names["embed"], (cfg.vocab_size, cfg.dim))
    add(names["lm_head"], (cfg.vocab_size, cfg.dim))
    for l in range(cfg.n_layers):
        add(names["attn_norm"].format(l=l), (cfg.dim,))
        add(names["ffn_norm"].format(l=l), (cfg.dim,))
        for p in ("wq", "wk", "wv", "wo"):
            add(names[p].format(l=l), dims[p])
        if family == "mixtral":
            add(names["gate"].format(l=l), (cfg.n_experts, cfg.dim))
            for e in range(cfg.n_experts):
                for p in ("w1", "w2", "w3"):
                    add(names[p].format(l=l, e=e), dims[p])
        else:
            for p in ("w1", "w2", "w3"):
                add(names[p].format(l=l), dims[p])
    w.save()
    return tensors


@pytest.mark.parametrize("family,dtype", [("mistral", "bf16"),
                                          ("mistral", "int8"),
                                          ("mistral", "int4"),
                                          ("mixtral", "bf16")])
def test_convert_load_forward(tmp_path, rng, family, dtype):
    cfg = tiny_test_model(n_experts=4 if family == "mixtral" else 1)
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8, dtype=dtype)
    src, dst = tmp_path / "hf", tmp_path / "buckets"
    src.mkdir()
    tensors = _write_hf_ckpt(src, cfg, rng, family)
    convert_checkpoint(str(src), str(dst), cfg, bcfg, family=family,
                       progress=lambda *a: None)

    w, cfg2, bcfg2 = load_bucketized(str(dst))
    assert cfg2.n_layers == cfg.n_layers

    # forward runs and produces finite logits
    k, v = make_kv_cache(cfg2)
    logits, _, _ = forward_token(w, cfg2, jnp.asarray(3), jnp.asarray(0),
                                 k, v, effort=0.9, impl="jnp")
    assert np.isfinite(np.asarray(logits)).all()

    # a loaded bucketized matrix reproduces the dense product at effort 1
    names = HF_NAME_MAPS[family]
    wq_hf = tensors[names["wq"].format(l=0)]
    x = rng.standard_normal(cfg.dim).astype(np.float32)
    y_dense = x @ wq_hf.T
    from effort_tpu.ops.bucketmul import bucket_matvec_jnp
    y = np.asarray(bucket_matvec_jnp(w.layers.wq, jnp.asarray(x), 1.0,
                                     expert=0))
    cs = y @ y_dense / (np.linalg.norm(y) * np.linalg.norm(y_dense))
    thresh = 0.999 if dtype == "bf16" else 0.99
    assert cs > thresh, cs


def test_truncated_load(tmp_path, rng):
    cfg = tiny_test_model()
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    src, dst = tmp_path / "hf", tmp_path / "b"
    src.mkdir()
    _write_hf_ckpt(src, cfg, rng)
    convert_checkpoint(str(src), str(dst), cfg, bcfg,
                       progress=lambda *a: None)
    w_full, *_ = load_bucketized(str(dst))
    w_half, *_ = load_bucketized(str(dst), percent_load=0.5)
    assert w_half.layers.wq.n_ranks == 2
    assert w_half.layers.wq.vals.shape[0] < w_full.layers.wq.vals.shape[0]
    k, v = make_kv_cache(cfg)
    logits, _, _ = forward_token(w_half, cfg, jnp.asarray(3), jnp.asarray(0),
                                 k, v, effort=1.0, impl="jnp")
    assert np.isfinite(np.asarray(logits)).all()


def test_convert_calibrated_bake_equivalence(tmp_path, rng):
    """Baked-relayout conversion must produce the same model function:
    logits of the baked checkpoint == logits of the plain checkpoint."""
    cfg = tiny_test_model()
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    src = tmp_path / "hf"
    _write_hf_ckpt(src, cfg, rng)
    calib = {"rms_m": np.exp(rng.normal(0, 1.2, cfg.dim)),
             "rms_f": np.exp(rng.normal(0, 1.2, cfg.hidden_dim))}

    logits = {}
    for tag, kw in (("plain", {}), ("baked", {"calib": calib})):
        dst = tmp_path / tag
        convert_checkpoint(str(src), str(dst), cfg, bcfg,
                           progress=lambda *_: None, **kw)
        w, cfg2, _ = load_bucketized(str(dst))
        kc, vc = make_kv_cache(cfg2)
        lg, _, _ = forward_token(w, cfg2, jnp.asarray(3), jnp.asarray(0),
                                 kc, vc, effort=1.0, impl="jnp")
        logits[tag] = np.asarray(lg)
    a, b = logits["plain"], logits["baked"]
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
    assert cos > 0.9999, cos


def test_convert_b1_mxu_layout(tmp_path, rng):
    """bucket_size=1 (row-prefix MXU) checkpoints round-trip: per-matrix
    chunk sizes are recovered from the stored shapes."""
    cfg = tiny_test_model()
    bcfg = BucketConfig(bucket_size=1, chunk_rows=8)
    src, dst = tmp_path / "hf", tmp_path / "b1"
    _write_hf_ckpt(src, cfg, rng)
    convert_checkpoint(str(src), str(dst), cfg, bcfg,
                       progress=lambda *_: None)
    w, cfg2, _ = load_bucketized(str(dst))
    kc, vc = make_kv_cache(cfg2)
    lg, _, _ = forward_token(w, cfg2, jnp.asarray(3), jnp.asarray(0),
                             kc, vc, effort=0.5, impl="jnp")
    assert bool(jnp.isfinite(lg).all())


def test_collect_act_rms(rng):
    from effort_tpu.convert.calibrate import collect_act_rms
    from effort_tpu.models.transformer import init_random_weights
    cfg = tiny_test_model()
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8))
    out = collect_act_rms(w, cfg, [[1, 5, 9]])
    assert out["rms_m"].shape == (cfg.dim,)
    assert out["rms_f"].shape == (cfg.hidden_dim,)
    assert bool(jnp.isfinite(out["rms_m"]).all())
    assert float(out["rms_m"].min()) >= 0


def test_truncated_load_b1_rows(tmp_path, rng):
    """B=1 percent_load drops trailing (least-important) row chunks."""
    cfg = tiny_test_model()
    bcfg = BucketConfig(bucket_size=1, chunk_rows=8)
    src, dst = tmp_path / "hf", tmp_path / "b1t"
    _write_hf_ckpt(src, cfg, rng)
    calib = {"rms_m": np.exp(rng.normal(0, 1.2, cfg.dim)),
             "rms_f": np.exp(rng.normal(0, 1.2, cfg.hidden_dim))}
    convert_checkpoint(str(src), str(dst), cfg, bcfg, calib=calib,
                       progress=lambda *_: None)
    w_full, *_ = load_bucketized(str(dst))
    w_half, *_ = load_bucketized(str(dst), percent_load=0.5)
    assert w_half.layers.w1.in_dim == cfg.dim // 2
    assert w_half.layers.w1.vals.shape[0] < w_full.layers.w1.vals.shape[0]
    k, v = make_kv_cache(cfg)
    lg_h, _, _ = forward_token(w_half, cfg, jnp.asarray(3), jnp.asarray(0),
                               k, v, effort=1.0, impl="jnp")
    k, v = make_kv_cache(cfg)
    lg_f, _, _ = forward_token(w_full, cfg, jnp.asarray(3), jnp.asarray(0),
                               k, v, effort=1.0, impl="jnp")
    a, b = np.asarray(lg_h), np.asarray(lg_f)
    assert np.isfinite(a).all()
    # half the (importance-sorted) rows retain most of the output
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
    assert cos > 0.7, cos


def test_auto_percent_load():
    from effort_tpu.config import mistral_7b
    from effort_tpu.models.weights import (auto_percent_load,
                                           model_weight_bytes)
    cfg = mistral_7b()
    bcfg = BucketConfig(bucket_size=4, chunk_rows=16, dtype="bf16")
    # bf16 7B doesn't fully fit a 16 GB chip with 25% reserve -> degrade
    pl = auto_percent_load(cfg, bcfg, hbm_budget_bytes=16 * 2**30)
    assert pl < 1.0
    assert model_weight_bytes(cfg, bcfg, pl) <= 12 * 2**30
    # int8 fits whole
    b8 = BucketConfig(bucket_size=4, chunk_rows=16, dtype="int8")
    assert auto_percent_load(cfg, b8, hbm_budget_bytes=16 * 2**30) == 1.0
    # huge budget -> full load
    assert auto_percent_load(cfg, bcfg,
                             hbm_budget_bytes=64 * 2**30) == 1.0


@pytest.mark.parametrize("family", ["mistral", "mixtral"])
def test_convert_fused_roundtrip(tmp_path, rng, family):
    """fuse=True conversion stores wqkv/w13; the loaded fused model's
    logits track an unfused conversion of the same checkpoint."""
    cfg = tiny_test_model(n_experts=4 if family == "mixtral" else 1)
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    src, dstu, dstf = tmp_path / "hf", tmp_path / "bu", tmp_path / "bf"
    src.mkdir()
    _write_hf_ckpt(src, cfg, rng, family)
    convert_checkpoint(str(src), str(dstu), cfg, bcfg, family=family,
                       progress=lambda *a: None)
    convert_checkpoint(str(src), str(dstf), cfg, bcfg, family=family,
                       fuse=True, progress=lambda *a: None)

    wu, cfgu, _ = load_bucketized(str(dstu))
    wf, cfgf, _ = load_bucketized(str(dstf))
    assert wf.layers.wqkv is not None and wf.layers.w13 is not None
    assert wf.layers.wq is None

    def logits(w, cfg, eff):
        k, v = make_kv_cache(cfg)
        lg, _, _ = forward_token(w, cfg, jnp.asarray(3), jnp.asarray(0),
                                 k, v, effort=eff, impl="jnp")
        return np.asarray(lg)

    lu, lf = logits(wu, cfgu, 1.0), logits(wf, cfgf, 1.0)
    cos = lu @ lf / (np.linalg.norm(lu) * np.linalg.norm(lf) + 1e-30)
    assert cos > 0.999, cos
    assert np.argmax(lu) == np.argmax(lf)


def test_config_from_hf(tmp_path):
    """--model auto: ModelConfig derived from the HF config.json."""
    import json
    from effort_tpu.convert.convert import config_from_hf
    hf = {
        "model_type": "mistral",
        "architectures": ["MistralForCausalLM"],
        "hidden_size": 4096,
        "intermediate_size": 14336,
        "num_hidden_layers": 32,
        "num_attention_heads": 32,
        "num_key_value_heads": 8,
        "vocab_size": 32000,
        "rms_norm_eps": 1e-5,
        "rope_theta": 1000000.0,
        "max_position_embeddings": 32768,
        "sliding_window": 4096,
    }
    (tmp_path / "config.json").write_text(json.dumps(hf))
    cfg = config_from_hf(str(tmp_path))
    assert (cfg.dim, cfg.hidden_dim, cfg.n_layers) == (4096, 14336, 32)
    assert (cfg.n_heads, cfg.n_kv_heads, cfg.head_dim) == (32, 8, 128)
    assert cfg.rope_theta == 1e6 and cfg.sliding_window == 4096
    assert cfg.max_seq_len == 4096          # capped (KV preallocation)
    assert not cfg.is_moe
    assert config_from_hf(str(tmp_path), max_seq_len=8192).max_seq_len \
        == 8192

    # Mixtral: MoE fields picked up
    hf.update({"model_type": "mixtral", "num_local_experts": 8,
               "num_experts_per_tok": 2, "sliding_window": None})
    (tmp_path / "config.json").write_text(json.dumps(hf))
    cfg = config_from_hf(str(tmp_path))
    assert cfg.is_moe and cfg.n_experts == 8 and cfg.n_experts_per_tok == 2
    assert cfg.sliding_window is None


def test_convert_model_auto_end_to_end(tmp_path, rng):
    """CLI convert --model auto: config read from HF config.json, then
    the converted checkpoint loads and runs."""
    import json
    import jax
    from effort_tpu.cli import main as cli_main
    cfg = tiny_test_model()
    src = tmp_path / "hf"
    dst = tmp_path / "out"
    src.mkdir()
    _write_hf_ckpt(src, cfg, rng)
    (src / "config.json").write_text(json.dumps({
        "model_type": "tiny",
        "hidden_size": cfg.dim,
        "intermediate_size": cfg.hidden_dim,
        "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "head_dim": cfg.head_dim,
        "vocab_size": cfg.vocab_size,
        "rms_norm_eps": cfg.norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_seq_len,
    }))
    cli_main(["convert", "--model", "auto", "--src", str(src),
              "--dst", str(dst), "--bucket-size", "4",
              "--chunk-rows", "8"])
    w, cfg2, _ = load_bucketized(str(dst))
    assert cfg2.dim == cfg.dim and cfg2.n_layers == cfg.n_layers
    kc, vc = make_kv_cache(cfg2)
    lg, _, _ = forward_token(w, cfg2, jnp.asarray(3), jnp.asarray(0),
                             kc, vc, effort=1.0, impl="jnp")
    assert bool(jnp.isfinite(lg).all())


def test_load_dense_cores(tmp_path, rng):
    """store_core checkpoints load their dense copies (load_dense) and
    route effort=1.0 / prefill through the dense MXU path; attach_dense
    reconstructs an equivalent copy when cores were not stored
    (reference: loader.swift:46-166 always has its `core` option)."""
    from effort_tpu.models.weights import attach_dense
    from effort_tpu.ops.bucketmul import bucket_matvec, bucket_matmul
    cfg = tiny_test_model()
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    src, dst = tmp_path / "hf", tmp_path / "b"
    src.mkdir()
    tensors = _write_hf_ckpt(src, cfg, rng)
    convert_checkpoint(str(src), str(dst), cfg, bcfg, store_core=True,
                       progress=lambda *a: None)

    w, cfg2, _ = load_bucketized(str(dst), load_dense=True)
    wq = w.layers.wq
    assert wq.dense is not None and wq.dense.shape[0] == cfg.n_layers

    # dense copy == the HF weight (transposed), bf16-rounded
    wq_hf = tensors[HF_NAME_MAPS["mistral"]["wq"].format(l=0)]
    x = rng.standard_normal(cfg.dim).astype(np.float32)
    y_dense = x @ wq_hf.T
    y = np.asarray(bucket_matvec(wq, jnp.asarray(x), 1.0, expert=0,
                                 impl="dense"))
    cs = y @ y_dense / (np.linalg.norm(y) * np.linalg.norm(y_dense))
    assert cs > 0.999, cs

    # batched prefill auto-routes to the dense path at effort 1.0
    X = rng.standard_normal((3, cfg.dim)).astype(np.float32)
    Y = np.asarray(bucket_matmul(wq, jnp.asarray(X), 1.0, expert=0))
    Yd = X @ wq_hf.T
    cs_b = (Y * Yd).sum() / (np.linalg.norm(Y) * np.linalg.norm(Yd))
    assert cs_b > 0.999, cs_b

    # load_dense=False keeps the old behavior
    w0, *_ = load_bucketized(str(dst), load_dense=False)
    assert w0.layers.wq.dense is None

    # attach_dense reconstruction matches the stored core
    w1 = attach_dense(w0)
    d_rec = np.asarray(w1.layers.wq.dense[0], dtype=np.float32)
    d_core = np.asarray(wq.dense[0], dtype=np.float32)
    assert np.allclose(d_rec, d_core, atol=2e-2), \
        np.abs(d_rec - d_core).max()

    # truncated loading never attaches mismatched cores
    wt, *_ = load_bucketized(str(dst), percent_load=0.5, load_dense=True)
    assert wt.layers.wq.dense is None


def test_int4_row_prefix_roundtrip(tmp_path, rng):
    """int4 + bucket_size=1 (the production row-prefix layout) through
    the DISK round-trip: the loader must recover the true out_dim from
    the nibble-packed vals (stored columns = out/2 — the wordlm-1b
    ckpt_int4 regression, round 5)."""
    cfg = tiny_test_model()
    bcfg = BucketConfig(bucket_size=1, chunk_rows=16, dtype="int4")
    src, dst = tmp_path / "hf", tmp_path / "b4"
    src.mkdir()
    tensors = _write_hf_ckpt(src, cfg, rng)
    convert_checkpoint(str(src), str(dst), cfg, bcfg,
                       progress=lambda *a: None)
    w, cfg2, bcfg2 = load_bucketized(str(dst))
    names = HF_NAME_MAPS["mistral"]
    wq_hf = tensors[names["wq"].format(l=0)]
    assert w.layers.wq.out_dim == wq_hf.shape[0], \
        (w.layers.wq.out_dim, wq_hf.shape)
    x = rng.standard_normal(cfg.dim).astype(np.float32)
    from effort_tpu.ops.bucketmul import bucket_matvec_jnp
    y = np.asarray(bucket_matvec_jnp(w.layers.wq, jnp.asarray(x), 1.0,
                                     expert=0))
    y_dense = x @ wq_hf.T
    cs = y @ y_dense / (np.linalg.norm(y) * np.linalg.norm(y_dense))
    assert y.shape == y_dense.shape
    assert cs > 0.98, cs
