"""Oracle study: rank-prefix (bucketMul) vs row-prefix (MXU-friendly)
selection — quality vs weight bytes read, numpy, CPU.

rank-prefix: per input row i keep the top-n_i elements of each bucket
  (n_i from the cutoff rule) — the reference bucketMul semantics. Bytes
  read ~ sum over rank slabs of alpha-covered prefix (here idealized as
  exactly the selected elements).
row-prefix: keep ALL elements of selected rows, none of others (rows
  chosen by stat_i * |v_i| > cutoff). Pure row gather -> dense dot (MXU).

Both idealized (no tile rounding): this isolates the APPROXIMATION
quality per byte. Activations: lognormal-rms heavy-tailed (the
persistent-outlier decode regime) AND uniform-rms (worst case for row
selection).
"""

import numpy as np

IN, OUT, B = 4096, 14336, 4
rng = np.random.default_rng(0)
W = (rng.standard_normal((IN, OUT)) * 0.02).astype(np.float32)


def quality_curves(rms, label, n_v=6):
    stats_row = np.abs(W).mean(axis=1)                    # [IN]
    # bucketized rank structure
    Wb = W.reshape(IN, OUT // B, B)
    order = np.argsort(-np.abs(Wb), axis=2)
    Wsort = np.take_along_axis(Wb, order, axis=2)         # [IN, nb, B]
    stats_rank = np.abs(Wsort).mean(axis=1)               # [IN, B] desc

    vs = [(rms * rng.standard_normal(IN)).astype(np.float32)
          for _ in range(n_v)]
    ys = [v @ W for v in vs]

    print(f"--- {label} ---")
    print("  frac_bytes  cos(rank-prefix)  cos(row-prefix)")
    for target in (0.15, 0.20, 0.25, 0.30, 0.40, 0.50):
        cs_rank, cs_row, fb_rank, fb_row = [], [], [], []
        for v, y in zip(vs, ys):
            a = np.abs(v)
            # rank-prefix: choose cutoff so selected ELEMENT count =
            # target * IN * B
            score = (stats_rank * a[:, None]).reshape(-1)  # [IN*B]
            k = int(target * score.size)
            cut = np.partition(score, -k)[-k]
            n_i = (stats_rank * a[:, None] > cut).sum(axis=1)  # [IN]
            mask = (np.arange(B)[None, None, :]
                    < n_i[:, None, None])                   # [IN,1,B]
            Wm = np.where(mask, Wsort, 0.0)
            # unsort back
            inv = np.argsort(order, axis=2)
            Wr = np.take_along_axis(Wm, inv, axis=2).reshape(IN, OUT)
            yr = v @ Wr
            cs_rank.append(y @ yr / (np.linalg.norm(y)
                                     * np.linalg.norm(yr) + 1e-30))
            fb_rank.append(n_i.sum() / (IN * B))
            # row-prefix: choose rows so ROW count = target * IN
            rscore = stats_row * a
            kr = int(target * IN)
            cutr = np.partition(rscore, -kr)[-kr]
            rows = rscore > cutr
            yw = (v * rows) @ W
            cs_row.append(y @ yw / (np.linalg.norm(y)
                                    * np.linalg.norm(yw) + 1e-30))
            fb_row.append(rows.mean())
        print(f"  {target:10.2f}  {np.mean(cs_rank):.4f} "
              f"(rd {np.mean(fb_rank):.3f})   {np.mean(cs_row):.4f} "
              f"(rd {np.mean(fb_row):.3f})")


quality_curves(np.exp(rng.normal(0, 1.2, IN)).astype(np.float32),
               "lognormal rms (decode regime)")
quality_curves(np.ones(IN, np.float32), "uniform rms (worst case)")
