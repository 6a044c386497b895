"""Pallas TPU kernel: banded windowed Damerau-Levenshtein + LCS, pairs in lanes.

The XLA row-vectorized kernel (dl_jax.dl_metrics_windowed) lays the string
dimension across vector lanes, wasting most of the 8x128 VPU shape on short
words and paying for cummin/cummax scans per row. This kernel flips the
layout: **1024 pairs occupy the full (8, 128) vector shape**, and the DP runs
cell-by-cell — the in-row deletion dependency is a plain register carry, and
every operation is a dense (8, 128) VPU op.

Two exactness-preserving prunes (both rely on the don't-care contract: values
above ``window`` only need to stay above ``window``; proof in dl_jax.py):

  * **bounded transposition lookback** — mat[last][db] is assembled from
    (window+1)^2 ring-buffer reads at *uniform* indices with per-pair
    selects; no per-lane gathers (TPUs cannot do those efficiently);
  * **diagonal banding** — D(s[:i], t[:j]) >= |i-j|, so cells with
    |i-j| > window+1 are don't-care. Only the 2*window+3 band cells per row
    are computed; a window+1 margin on each side is cleared to ``big`` so
    ring-slot reuse cannot leak stale small values into live reads.

The LCS-substring recurrence has no such band (a long common substring may
sit far off-diagonal), but it has no in-row dependency either, so it runs as
a second cheap per-row loop.

Layout: inputs are [nblk, L, 8, 128] int32 (strings along the second axis,
pairs in the trailing VPU shape); grid = (nblk,).

Exactness contract validated against dl_metrics_windowed and the scalar
oracle in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024  # pairs per grid step: 8 sublanes x 128 lanes
SUB, LANE = 8, 128


def _dl_kernel(a_ref, b_ref, al_ref, bl_ref, ld_ref, lcs_ref, *, L: int, W: int):
    """One block: banded DP over 1024 pairs simultaneously.

    Both DP loops are **fully unrolled with static indices**: traced indices
    into VMEM refs force Mosaic into expensive dynamic-slice lowering, while
    static offsets compile to plain vector loads/stores. For the word lengths
    this engine sees (L <= ~48) the unrolled program stays small.
    """
    R = W + 3  # ring depth (rows i..i-W-1 live while row i+1 is written)
    big = 2 * L + 8

    def body(ring, lastcol, lcsrow):
        al = al_ref[0]
        bl = bl_ref[0]

        # ring slot r holds mat row (row_index mod R), positions 0..L where
        # position p <-> mat column p+1. Unwritten slots stay `big`
        # (sentinel mat[0] / out-of-range rows).
        ring[...] = jnp.full((R, L + 1, SUB, LANE), big, dtype=jnp.int32)
        for p in range(L + 1):
            ring[1 % R, p] = jnp.full((SUB, LANE), p, dtype=jnp.int32)  # mat[1]
        lastcol[...] = jnp.zeros((L, SUB, LANE), jnp.int32)
        lcsrow[...] = jnp.zeros((L, SUB, LANE), jnp.int32)

        big_vec = jnp.full((SUB, LANE), big, dtype=jnp.int32)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (L, SUB, LANE), 0)

        res = big_vec
        lcs_best = jnp.zeros((SUB, LANE), jnp.int32)

        for i1 in range(L):  # static unroll over query positions
            i = i1 + 1  # reading mat[i], writing mat[i+1]
            s_char = a_ref[0, i1]
            wslot = (i + 1) % R
            rslot = i % R
            center = i1 + 1  # band center column
            jstart = max(1, center - (W + 1))
            jend = min(L, center + (W + 1))  # inclusive

            # mat[i+1][1] = i (position 0); clear the stale margin around the
            # band so ring-slot reuse cannot resurrect old small values
            i_vec = jnp.full((SUB, LANE), i, dtype=jnp.int32)
            ring[wslot, 0] = i_vec
            for m in range(1, W + 2):
                for jj in (center - (W + 1) - m, center + (W + 1) + m):
                    if 1 <= jj <= L:
                        ring[wslot, jj] = big_vec

            # ---- banded DL pass ----
            # Live candidate rows mat[i-1] .. mat[i-ndl] stacked once per
            # row: each cell's transposition lookback then runs as ONE
            # [d, s]-rectangle slab op chain (slice + iota selects + min)
            # instead of per-(d, s) scalar ops — ~10 ops per cell rather
            # than ~5 * W^2/2, which shrinks the unrolled program ~8x at
            # W=12 (interpret-mode tests and Mosaic compiles scale with
            # program size). The rectangle includes (d, s) pairs the old
            # d+s <= W+1 prune skipped; those terms are genuine candidate
            # penalties (v + d + s - 1, all > window), so exactness under
            # the don't-care contract is unchanged.
            ndl = min(W, i)  # rows i-1 .. i-ndl are live (i-d = 0 -> big)
            live = jnp.stack(
                [ring[(i - d) % R] for d in range(1, ndl + 1)]
            )  # [ndl, L+1, SUB, LANE]

            del_prev = i_vec if jstart == 1 else big_vec
            db_cur = jnp.zeros((SUB, LANE), jnp.int32)
            for j in range(jstart, jend + 1):  # static
                t_char = b_ref[0, j - 1]
                match = t_char == s_char
                cost = jnp.where(match, 0, 1)

                sub = ring[rslot, j - 1] + cost  # mat[i][j] + cost
                ins = ring[rslot, j] + 1  # mat[i][j+1] + 1
                dele = del_prev + 1

                last = lastcol[j - 1]
                transp = big_vec
                smax0 = min(W, j - 1)
                if smax0 >= 1:
                    # V[d-1, q] = mat[i-d][l] for column l = j-smax0+q
                    # (ring position l-1); row/column matches select the
                    # (last, db) candidate via in-kernel iotas —
                    # pallas_call cannot capture array constants
                    V = live[:, j - 1 - smax0 : j - 1]
                    d_io = jax.lax.broadcasted_iota(
                        jnp.int32, (ndl, smax0, SUB, LANE), 0
                    )
                    q_io = jax.lax.broadcasted_iota(
                        jnp.int32, (ndl, smax0, SUB, LANE), 1
                    )
                    # d = d_io+1, s = smax0-q_io: term = v + d + s - 1
                    term = V + d_io + (smax0 - q_io)
                    sel = (last[None, None] == i - 1 - d_io) & (
                        db_cur[None, None] == (j - smax0) + q_io
                    )
                    cand = jnp.where(sel, term, big_vec)
                    transp = jnp.min(cand, axis=(0, 1))

                newv = jnp.minimum(
                    jnp.minimum(sub, ins), jnp.minimum(dele, transp)
                )
                ring[wslot, j] = newv

                # result = mat[len_s+1][len_t+1]: row al+1, position bl
                res = jnp.where((i1 == al - 1) & (j == bl), newv, res)

                del_prev = newv
                db_cur = jnp.where(match, j, db_cur)
                lastcol[j - 1] = jnp.where(match, i, lastcol[j - 1])

            # ---- full-width LCS pass as [L, 8, 128] slab ops ----
            match_row = b_ref[0] == s_char[None]
            valid = match_row & (i1 < al)[None] & (col_ids < bl[None])
            prev = lcsrow[...]
            diag = jnp.concatenate(
                [jnp.zeros((1, SUB, LANE), jnp.int32), prev[: L - 1]], axis=0
            )
            lcs_new = jnp.where(valid, diag + 1, 0)
            lcsrow[...] = lcs_new
            lcs_best = jnp.maximum(lcs_best, jnp.max(lcs_new, axis=0))

        # empty-side shortcuts (distance.rs:109-130)
        res = jnp.where(al == 0, bl, res)
        res = jnp.where(bl == 0, al, res)
        ld_ref[0] = res
        lcs_ref[0] = lcs_best

    pl.run_scoped(
        body,
        ring=pltpu.VMEM((R, L + 1, SUB, LANE), jnp.int32),
        lastcol=pltpu.VMEM((L, SUB, LANE), jnp.int32),
        lcsrow=pltpu.VMEM((L, SUB, LANE), jnp.int32),
    )


def _dl_lcs_pallas(
    a: jnp.ndarray,  # int32 [P, L], PAD_A padded
    a_len: jnp.ndarray,  # int32 [P]
    b: jnp.ndarray,  # int32 [P, L], PAD_B padded
    b_len: jnp.ndarray,  # int32 [P]
    max_len: int,
    window: int,
    interpret: bool = False,
):
    """Windowed DL + LCS via the Pallas kernel. P must be a multiple of 1024.

    Returns (ld, lcs) int32 [P]. Prefix/suffix metrics are cheap dense vector
    ops and stay in XLA.
    """
    P, L = a.shape
    assert L == max_len
    assert P % BLOCK == 0, P
    nblk = P // BLOCK

    a4 = a.reshape(nblk, SUB, LANE, L).transpose(0, 3, 1, 2)
    b4 = b.reshape(nblk, SUB, LANE, L).transpose(0, 3, 1, 2)
    al3 = a_len.reshape(nblk, SUB, LANE)
    bl3 = b_len.reshape(nblk, SUB, LANE)

    kernel = functools.partial(_dl_kernel, L=L, W=window)
    ld3, lcs3 = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, L, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk, SUB, LANE), jnp.int32),
            jax.ShapeDtypeStruct((nblk, SUB, LANE), jnp.int32),
        ],
        interpret=interpret,
    )(a4, b4, al3, bl3)

    ld = ld3.reshape(P)
    lcs = lcs3.reshape(P)
    return ld, lcs


_dl_lcs_pallas_jit = jax.jit(
    _dl_lcs_pallas, static_argnames=("max_len", "window", "interpret")
)


def dl_lcs_pallas(a, a_len, b, b_len, max_len, window, interpret=False):
    """Jit on hardware; eager under ``interpret=True`` (tests): jitting the
    interpreter lowers the whole unrolled DP into one giant XLA CPU program
    whose compile costs minutes, while eager interpretation runs it op-by-op
    in seconds."""
    if interpret:
        return _dl_lcs_pallas(a, a_len, b, b_len, max_len, window, True)
    return _dl_lcs_pallas_jit(a, a_len, b, b_len, max_len, window)
