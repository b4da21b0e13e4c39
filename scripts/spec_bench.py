"""Self-speculative decode benchmark on the real TPU.

Plain full-effort decode vs generate_speculative at several
(draft_effort, k) points, on a reduced-layer Mistral-dims model with
synthetic calibrated weights. Speculation wins when acceptance is high
(trained models accept most drafts; the synthetic model's thin argmax
margins make acceptance pessimistic — treat these numbers as the FLOOR).

Usage: spec_bench.py [n_layers] [dtype] [k_csv] [draft_efforts_csv]
"""

import sys
import time

import jax
import jax.numpy as jnp

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig, mistral_7b
from effort_tpu.models.transformer import init_random_weights
from effort_tpu.models.generate import Engine


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    ks = ([int(x) for x in sys.argv[3].split(",")]
          if len(sys.argv) > 3 else [4, 8])
    drafts = ([float(x) for x in sys.argv[4].split(",")]
              if len(sys.argv) > 4 else [0.25, 0.15])
    cfg = mistral_7b(n_layers=L, max_seq_len=512)
    bcfg = BucketConfig(bucket_size=1, chunk_rows=128, dtype=dtype)
    t0 = time.time()
    w = init_random_weights(cfg, bcfg, seed=0, calibrate=True, fuse=True)
    jax.block_until_ready(w.layers.any_w1.vals)
    print(f"init {time.time()-t0:.0f}s; L={L} dtype={dtype}", flush=True)

    eng = Engine(w, cfg, impl="auto", pad_to=32)
    prompt = list(range(2, 26))
    N = 128

    def timed(fn):
        # one consistent definition for BOTH paths: wall time of the
        # post-compile call / emitted tokens (Reply.tokens_per_s counts
        # prompt-consumption steps for generate but only emitted tokens
        # for generate_speculative — mixing them biases the ratio)
        r = fn()              # compile
        t0 = time.time()
        r = fn()
        dt = time.time() - t0
        return r, len(r.token_ids) / dt, dt * 1e3 / max(
            len(r.token_ids), 1)

    r, plain_tps, plain_ms = timed(
        lambda: eng.generate(prompt, n_new=N, effort=1.0))
    print(f"plain effort=1.0   : {plain_ms:6.2f} ms/tok "
          f"({plain_tps:6.1f} tok/s)", flush=True)
    for k in ks:
        for d in drafts:
            r, tps, ms = timed(lambda d=d, k=k: eng.generate_speculative(
                prompt, n_new=N, draft_effort=d, k=k))
            print(f"spec k={k} draft={d:4.2f}: {ms:6.2f} ms/tok "
                  f"({tps:6.1f} tok/s, "
                  f"{r.spec_tokens_per_iter:4.2f} tok/round, "
                  f"{tps/plain_tps:4.2f}x plain)", flush=True)


if __name__ == "__main__":
    main()
