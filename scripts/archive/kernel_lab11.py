"""Lab 11: prefix-stream kernel headroom dissection.

Questions:
  1. ALU vs DMA split: a no-scatter variant (sum c only, wrong result)
     bounds the DMA+mul floor; the production select-loop variant shows
     what the position scatter costs on top.
  2. Does the bit-decomposition accumulation (3 muls + 4 shared-term
     reductions instead of B cmp+select+reduce passes) beat the select
     loop for B=4?
  3. TGB (tile size) and slots (ring depth) sweep.
  4. select_stream (XLA-side dispatch) cost alone.

Usage: kernel_lab11.py [B] [G] [effort] [N_in] [N_out] [alpha]
"""

import sys
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import dense_matvec
from effort_tpu.kernels.prefix_stream import select_stream, StreamSelection
from effort_tpu.utils.timing import chain_time


def _kernel_v(S, B, K, TGB, nc, pos_bits, vpacked, OB, variant,
              cum_ref, base_ref, u_ref, vals_hbm, pos_hbm, out_ref,
              vscr, pscr, vsem, psem):
    G = vscr.shape[2]
    per_byte = 8 // pos_bits
    OBp = pscr.shape[3]
    OB_pad = OBp * per_byte
    total = cum_ref[K]

    def tile_rank(t):
        r = jnp.int32(0)
        for k in range(1, K):
            r = r + (t >= cum_ref[k]).astype(jnp.int32)
        return r

    def dmas(t, slot):
        k = tile_rank(t)
        sb = base_ref[k] + (t - cum_ref[k]) * TGB
        return (pltpu.make_async_copy(vals_hbm.at[pl.ds(sb, TGB)],
                                      vscr.at[slot], vsem.at[slot]),
                pltpu.make_async_copy(pos_hbm.at[pl.ds(sb, TGB)],
                                      pscr.at[slot], psem.at[slot]))

    out_ref[...] = jnp.zeros_like(out_ref)
    for s in range(S):
        @pl.when(s < total)
        def _(s=s):
            a, b = dmas(jnp.int32(s), s)
            a.start()
            b.start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (TGB, G, OB_pad), 2)
    shift = (lane // OBp) * pos_bits
    mask_val = (1 << pos_bits) - 1

    def body(t, _):
        slot = jax.lax.rem(t, S)
        a, bdma = dmas(t, slot)
        a.wait()
        bdma.wait()
        k = tile_rank(t)
        toff = (t - cum_ref[k]) * TGB
        u = u_ref[k, pl.ds(toff, TGB), :]
        c = vscr[slot].astype(jnp.float32) * u[:, :, None]
        if variant == "noscatter":
            out_ref[0, :] += jnp.sum(c, axis=(0, 1))
        elif variant == "select":
            packed = pscr[slot].astype(jnp.int32)
            p = (pltpu.repeat(packed, per_byte, axis=2) >> shift) \
                & mask_val
            p = p[:, :, :OB]
            for pp in range(B):
                m = (p == pp).astype(jnp.float32)
                out_ref[pp, :] += jnp.sum(m * c, axis=(0, 1))
        elif variant == "bits":
            assert B == 4
            packed = pscr[slot].astype(jnp.int32)
            p = (pltpu.repeat(packed, per_byte, axis=2) >> shift) \
                & mask_val
            p = p[:, :, :OB]
            b0 = (p & 1).astype(jnp.float32)
            b1 = (p >> 1).astype(jnp.float32)
            cb0 = c * b0
            cb1 = c * b1
            cb01 = cb0 * b1
            s_all = jnp.sum(c, axis=(0, 1))
            s0 = jnp.sum(cb0, axis=(0, 1))
            s1 = jnp.sum(cb1, axis=(0, 1))
            s01 = jnp.sum(cb01, axis=(0, 1))
            out_ref[0, :] += s_all - s0 - s1 + s01
            out_ref[1, :] += s0 - s01
            out_ref[2, :] += s1 - s01
            out_ref[3, :] += s01
        elif variant == "nounpack":
            # select loop on raw packed bytes (wrong result): isolates
            # the repeat/unpack cost
            p = pscr[slot].astype(jnp.int32)
            for pp in range(B):
                m = (p[:, :, :1] * 0 + pp == pp).astype(jnp.float32)
                out_ref[pp, :] += jnp.sum(m * c, axis=(0, 1))
        return 0

    jax.lax.fori_loop(0, total, body, 0)


@functools.lru_cache(maxsize=None)
def _mk(S, B, K, TGB, nc, bits, vpacked, OB, variant):
    return functools.partial(_kernel_v, S, B, K, TGB, nc, bits, vpacked,
                             OB, variant)


def stream_matvec_v(bm, sel, tile_blocks, slots, variant):
    B, K, G, OB = (bm.bucket_size, bm.n_ranks, bm.chunk_rows, bm.n_buckets)
    kernel = _mk(slots, B, K, tile_blocks, bm.n_chunks, bm.pos_bits,
                 bm.vals_packed, OB, variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, tile_blocks, G, bm.vals.shape[-1]),
                       bm.vals.dtype),
            pltpu.VMEM((slots, tile_blocks, G, bm.pos.shape[-1]),
                       jnp.uint8),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    acc = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, OB), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(sel.cum_tiles, sel.base_blocks, sel.u_scaled, bm.vals, bm.pos)
    return acc.T.reshape(OB * B)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    effort = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    NI = int(sys.argv[4]) if len(sys.argv) > 4 else 4096
    NO = int(sys.argv[5]) if len(sys.argv) > 5 else 14336
    alpha = float(sys.argv[6]) if len(sys.argv) > 6 else 1.3

    wt = jax.random.normal(jax.random.key(0), (NI, NO), jnp.float32) * 0.02
    rms = jnp.exp(jax.random.normal(jax.random.key(5), (NI,)) * 1.2)
    bm = bucketize(wt, BucketConfig(bucket_size=B, chunk_rows=G),
                   act_rms=rms, perm_segment=1, keep_dense=True)
    wt_bf16 = wt.astype(jnp.bfloat16)
    print(f"B={B} G={G} {NI}x{NO} e={effort} alpha={alpha} "
          f"blocks={bm.blocks_per_expert}", flush=True)

    def acts(seed):
        return rms * jax.random.normal(jax.random.key(seed), (NI,))

    def bounce(y):
        return jnp.tanh(y[:NI] * 0.02 + y[NI:2 * NI] * 0.01)

    # dense reference
    def mk_dense(n):
        @jax.jit
        def run(v, w):
            def body(i, v):
                return bounce(dense_matvec(v, w))
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t_dense = chain_time(mk_dense, 8, 104,
                         [(acts(100 + i), wt_bf16) for i in range(12)])
    print(f"dense       : {t_dense*1e6:7.1f} us  "
          f"({NI*NO*2/t_dense/1e9:6.1f} GB/s)", flush=True)

    # select_stream alone (bounce via u_scaled sum)
    def mk_sel(n):
        @jax.jit
        def run(v, bmx):
            def body(i, v):
                s = select_stream(bmx, v, effort, 0, alpha=alpha,
                                  tile_blocks=8)
                y = jnp.sum(s.u_scaled) \
                    + s.cum_tiles[-1].astype(jnp.float32)
                return jnp.tanh(v * 0.9 + y * 1e-9)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t_sel = chain_time(mk_sel, 8, 104,
                       [(acts(200 + i), bm) for i in range(12)])
    print(f"select only : {t_sel*1e6:7.1f} us", flush=True)

    # kernel variants at TGB=8, slots=3
    for variant in ("noscatter", "select", "bits", "nounpack"):
        for TGB, S in ((8, 3), (16, 3), (4, 4), (8, 4), (32, 2)):
            if bm.n_chunks % TGB:
                continue
            def mk(n, TGB=TGB, S=S, variant=variant):
                @jax.jit
                def run(v, bmx):
                    def body(i, v):
                        s = select_stream(bmx, v, effort, 0, alpha=alpha,
                                          tile_blocks=TGB)
                        y = stream_matvec_v(bmx, s, TGB, S, variant)
                        return bounce(y)
                    return jax.lax.fori_loop(0, n, body, v)
                return run
            t = chain_time(mk, 8, 104,
                           [(acts(300 + i), bm) for i in range(12)])
            print(f"{variant:11s}: {t*1e6:7.1f} us  TGB={TGB:2d} S={S}  "
                  f"({t_dense/t:4.2f}x dense)", flush=True)

    # quality sanity for bits variant
    v = acts(999)
    sel = select_stream(bm, v, effort, 0, alpha=alpha, tile_blocks=8)
    y_sel = np.asarray(stream_matvec_v(bm, sel, 8, 3, "select"))
    y_bits = np.asarray(stream_matvec_v(bm, sel, 8, 3, "bits"))
    err = np.abs(y_sel - y_bits).max() / (np.abs(y_sel).max() + 1e-30)
    print(f"bits vs select max rel err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
