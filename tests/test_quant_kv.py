"""int8 KV cache: quantized attention vs the bf16 full cache."""

import numpy as np
import jax.numpy as jnp

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.transformer import (init_random_weights,
                                           forward_token, make_kv_cache,
                                           make_quant_kv_cache,
                                           quant_kv_hooks)
from effort_tpu.models.generate import Engine


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


def test_quant_kv_logits_close_to_full():
    cfg = tiny_test_model(max_seq_len=24)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8),
                            seed=0)
    ids = jnp.asarray((np.arange(20) * 7 + 3) % cfg.vocab_size, jnp.int32)

    kc, vc = make_kv_cache(cfg)
    (kq, vq), hooks = make_quant_kv_cache(cfg), quant_kv_hooks(cfg)
    kv_up, attn = hooks
    for pos in range(len(ids)):
        p = jnp.asarray(pos, jnp.int32)
        lg, kc, vc = forward_token(w, cfg, ids[pos], p, kc, vc,
                                   effort=1.0, impl="jnp")
        lq, kq, vq = forward_token(w, cfg, ids[pos], p, kq, vq,
                                   effort=1.0, impl="jnp",
                                   kv_update_fn=kv_up, attn_fn=attn)
        assert _cos(lq, lg) > 0.999, (pos, _cos(lq, lg))
    # int8 data + f32 per-(slot,head) scale = ~half the bf16 bytes
    assert kq[0].dtype == jnp.int8
    kv_bytes = kq[0].size * 1 + kq[1].size * 4
    full_bytes = kc.size * 2
    assert kv_bytes < 0.6 * full_bytes


def test_engine_quant_kv_generates():
    cfg = tiny_test_model(max_seq_len=64)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8),
                            seed=2)
    full = Engine(w, cfg, impl="jnp", pad_to=8)
    q8 = Engine(w, cfg, impl="jnp", pad_to=8, quant_kv=True)
    a = full.generate([1, 5, 9], n_new=12, effort=1.0)
    b = q8.generate([1, 5, 9], n_new=12, effort=1.0)
    # int8 KV is an approximation; on a random tiny model (thin argmax
    # margins) demand most tokens agree rather than all
    agree = sum(x == y for x, y in zip(a.token_ids, b.token_ids))
    assert agree >= len(a.token_ids) // 2, (a.token_ids, b.token_ids)
    assert len(b.token_ids) == 12


def test_batch_engine_int8_kv():
    """int8 batch cache: slots decode close to the bf16 batch cache."""
    from effort_tpu.serving.batcher import BatchEngine, ContinuousBatcher
    cfg = tiny_test_model(max_seq_len=64)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8),
                            seed=1)
    prompts = [[1, 5, 9], [4, 8, 15, 16]]
    outs = {}
    for dtype in ("bf16", "int8"):
        be = BatchEngine(w, cfg, batch_size=2, pad_to=8, impl="jnp",
                         prefill_impl="jnp", kv_dtype=dtype)
        cb = ContinuousBatcher(be)
        res = {}
        for i, p in enumerate(prompts):
            cb.submit(p, 8, 1.0, lambda o, i=i: res.__setitem__(i, o))
        cb.run_until_drained()
        outs[dtype] = res
    if dtype == "int8":
        (kd, _), _ = be.k_cache, be.v_cache
        assert kd.dtype == jnp.int8
    for i in range(len(prompts)):
        a, b = outs["bf16"][i], outs["int8"][i]
        agree = sum(x == y for x, y in zip(a, b))
        assert agree >= len(a) // 2, (i, a, b)
