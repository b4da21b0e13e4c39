"""Production Pallas kernels inside shard_map on the REAL chip.

Round-1 gap: every multi-device test and the driver dryrun ran
impl="jnp"; the fused Pallas kernels (the replacement for the
reference's whole GPU runtime layer, gpu.swift:135-196) had never
executed inside shard_map. A 1-device mesh on real hardware proves the
risky composition — scalar-prefetch grids + manual DMA inside a
shard_map-partitioned jit — exactly where it will run in production.

Checks, at Mistral dims (reduced layers):
  1. parity: shard_map(tp=1, impl=pallas) logits vs plain
     forward_token(impl=pallas) and vs the jnp semantics path
  2. speed: per-token decode time inside shard_map vs outside (the
     wrapper must be ~free)
  3. dp axis present in the mesh (dp=1) alongside tp.

Usage: python scripts/tp_pallas_tpu.py [n_layers]
Writes artifacts/tp_pallas_tpu.json (committed evidence).
"""

import functools
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("EFFORT_TPU_TAU", "1.0")   # parity legs compare
# the kernel against the jnp semantics: tau=1.0 streams through the
# last selected chunk (exact selection coverage), so the two paths
# compute the same function; production tau trades a bounded selected-
# mass tail for speed and is measured separately (artifacts/tau_sweep).

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig, mistral_7b
from effort_tpu.models.transformer import forward_token, make_kv_cache
from effort_tpu.parallel import shard_map
from effort_tpu.parallel.tp import (make_mesh, make_tp_weights,
                                    tp_forward_token, tp_specs,
                                    local_config)


def cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = mistral_7b(n_layers=L, max_seq_len=256)
    bcfg = BucketConfig(bucket_size=1, chunk_rows=128, dtype="bf16")
    n_tp = 1
    mesh = make_mesh(1, n_tp)
    print(f"mesh: {mesh} on {jax.devices()}", flush=True)
    t0 = time.time()
    w_tp, cfg_local = make_tp_weights(cfg, bcfg, n_tp, seed=0)
    jax.block_until_ready(w_tp.layers.wq.vals)
    print(f"weights ready {time.time()-t0:.0f}s", flush=True)

    results = {"n_layers": L, "mesh": str(mesh.shape)}

    # ---- 1. single-token parity: shard_map+pallas vs plain paths ----
    def step(impl):
        def f(w_local, tok, pos, kc, vc):
            return tp_forward_token(w_local, cfg_local, tok, pos, kc, vc,
                                    effort=0.25, impl=impl)
        return shard_map(
            f, mesh=mesh,
            in_specs=(tp_specs(w_tp), P(), P(), P(None, None, "tp", None),
                      P(None, None, "tp", None)),
            out_specs=(P(), P(None, None, "tp", None),
                       P(None, None, "tp", None)))

    kc, vc = make_kv_cache(cfg)
    tok, pos = jnp.asarray(3), jnp.asarray(0)
    lg_sm_pallas, _, _ = jax.jit(step("pallas"))(w_tp, tok, pos, kc, vc)
    lg_sm_jnp, _, _ = jax.jit(step("jnp"))(w_tp, tok, pos, kc, vc)
    # plain (no shard_map) pallas on the same weights (tp=1: identical)
    lg_plain, _, _ = jax.jit(functools.partial(
        forward_token, cfg=cfg_local, effort=0.25, impl="pallas"))(
            w_tp, token_id=tok, pos=pos, k_cache=kc, v_cache=vc)
    results["cos_shardmap_pallas_vs_plain_pallas"] = cos(lg_sm_pallas,
                                                         lg_plain)
    results["cos_shardmap_pallas_vs_shardmap_jnp"] = cos(lg_sm_pallas,
                                                         lg_sm_jnp)
    print(f"parity: vs plain pallas {results['cos_shardmap_pallas_vs_plain_pallas']:.6f}, "
          f"vs jnp semantics {results['cos_shardmap_pallas_vs_shardmap_jnp']:.6f}",
          flush=True)
    # the load-bearing assertion: the shard_map wrapper changes NOTHING
    # about what the kernels compute
    assert results["cos_shardmap_pallas_vs_plain_pallas"] > 0.9999
    # vs_jnp is informational only: at matched (approximate) cutoffs the
    # PER-MATVEC kernel/jnp parity is exact (asserted below); the model-
    # level figure through RANDOM weights measures how a 2-layer
    # untrained network amplifies last-ulp fp differences, not kernel
    # correctness (trained-model agreement lives in QUALITY_trained.md).
    from effort_tpu.ops.bucketmul import bucket_matvec_jnp
    from effort_tpu.kernels.fused_stream import mxu_matvec
    mul_cos = {}
    for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
        bm = getattr(w_tp.layers, name, None)
        if bm is None:
            continue
        v = jax.random.normal(jax.random.key(7), (bm.in_dim,),
                              jnp.float32)
        y = mxu_matvec(bm, v, 0.25, 0, tau=1.0)
        yr = bucket_matvec_jnp(bm, v, 0.25, 0, exact_cutoff=False)
        mul_cos[name] = cos(y, yr)
        assert mul_cos[name] > 0.9999, (name, mul_cos[name])
    results["per_matvec_kernel_vs_jnp_cos"] = mul_cos
    print(f"per-matvec kernel-vs-jnp parity: "
          + " ".join(f"{k}:{v:.5f}" for k, v in mul_cos.items()),
          flush=True)

    # ---- 2. decode-scan speed inside vs outside shard_map ----
    def decode(w, tok0, n, effort, impl, wrap):
        def body(w_in):
            kc, vc = make_kv_cache(cfg)

            def one(carry, pos):
                tok, kc, vc = carry
                lg, kc, vc = (tp_forward_token(w_in, cfg_local, tok, pos,
                                               kc, vc, effort=effort,
                                               impl=impl)
                              if wrap else
                              forward_token(w_in, cfg_local, tok, pos,
                                            kc, vc, effort=effort,
                                            impl=impl))
                return (jnp.argmax(lg).astype(jnp.int32), kc, vc), ()

            (tok, _, _), _ = jax.lax.scan(
                one, (tok0, kc, vc), jnp.arange(n, dtype=jnp.int32))
            return tok

        if wrap:
            return shard_map(lambda w_in: body(w_in), mesh=mesh,
                             in_specs=(tp_specs(w_tp),),
                             out_specs=P())(w)
        return body(w)

    def ms_per_tok(wrap, effort=0.25, n_lo=8, n_hi=40):
        f_lo = jax.jit(functools.partial(decode, tok0=jnp.asarray(5),
                                         n=n_lo, effort=effort,
                                         impl="pallas", wrap=wrap))
        f_hi = jax.jit(functools.partial(decode, tok0=jnp.asarray(5),
                                         n=n_hi, effort=effort,
                                         impl="pallas", wrap=wrap))
        jax.block_until_ready(f_lo(w_tp))
        jax.block_until_ready(f_hi(w_tp))

        def t(f):
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(f(w_tp))
                best = min(best, time.time() - t0)
            return best

        return (t(f_hi) - t(f_lo)) / (n_hi - n_lo) * 1e3

    in_sm = ms_per_tok(True)
    plain = ms_per_tok(False)
    results["ms_per_tok_shardmap"] = in_sm
    results["ms_per_tok_plain"] = plain
    print(f"decode @25%: {in_sm:.2f} ms/tok in shard_map, "
          f"{plain:.2f} plain ({L} layers)", flush=True)

    os.makedirs(f"{ROOT}/runs", exist_ok=True)
    json.dump(results, open(f"{ROOT}/artifacts/tp_pallas_tpu.json", "w"),
              indent=1)
    print("OK — production kernels run inside shard_map on TPU")


if __name__ == "__main__":
    main()
