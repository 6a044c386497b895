"""Stage A: charcount-banded L1-ball retrieval masks — Pallas + XLA fallback.

Computes, for every (query, lexicon row) pair, whether the row lies in the
query's L1 ball, and emits *compact artifacts* instead of materializing the
[B, Ni] distance matrix in HBM.

**Charcount banding.** L1(a, q) >= |cc(a) - cc(q)|, so only rows with
charcount within +-k of the query's can match. The device index is laid out
sorted by charcount (ops/pipeline.py applies the permutation and maps
survivor rows back to canonical order on the host), queries are sorted by
charcount within the batch, and each tile of B_TILE queries scans only the
contiguous block range covering [min cc - k, max cc + k] for its tile —
the TPU equivalent of the reference's sortedindex charcount-bucket sweep
(/root/reference/src/lib.rs:1266-1288). The host computes the per-tile
start block exactly (it holds the same sorted charcount array), and the
static band width ``nb_band`` is bucketed so typical workloads compile one
kernel variant. Extra rows at the band edges are REAL rows that simply fail
the L1 test — coverage, not exactness, is the only banding requirement.

Banded outputs (Nb = nb_band * ROW_BLOCK rows per tile band):

  * ``packed_q``  uint8 [B, Nb/8]   — hit mask, bit-packed along band rows
    (bit semantics: byte j of a query row holds band rows 8j..8j+7, bit k
    <-> row 8j+k); band row r of query q is global device row
    ``start_blk[q // B_TILE] * ROW_BLOCK + r``
  * ``exact_q``   uint8 [B, Nb/8]   — exact-anagram mask (L1 == 0)
  * ``counts_t``  int32 [Nb/128, B] — hits per 128-row band block, lex-major
    (column q holds query q's OWN tile band)
  * ``nmatch``/``nexact`` int32 [B] — per-query totals

The Pallas kernel's grid is (query tiles, band blocks); the per-tile start
block arrives via scalar prefetch so the lexicon operands' index maps select
the banded blocks directly — no slicing copies, and HBM traffic stays a few
bytes per *band* row. The XLA fallback (CPU backend) dynamic-slices the band
per tile inside a lax.map and produces identical outputs.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 1024  # lexicon rows per grid step (and band-start granularity)
B_TILE = 1024  # queries per grid step / per band tile


def _row_block(B: int) -> int:
    """Rows per grid step. The kernel tiles the query dimension at B_TILE, so
    the [RB, B_TILE] int32 intermediates stay inside scoped VMEM for any B."""
    return ROW_BLOCK


# Above this many lexicon rows, shrink the query tile: a tile's band must
# cover the JOINT charcount range of its queries (+-k), and rows-per-charcount
# grows linearly with Ni — at ~1M rows a 1024-query tile's band approaches the
# whole lexicon, erasing the banding win. A 256-query tile quarters the
# per-tile cc spread (queries arrive cc-sorted) for ~3-4x less stage-A work;
# the extra grid steps are cheap because each step still processes a full
# [ROW_BLOCK, bt] block. Threshold keeps eng.aspell-scale (~120k rows)
# lexicons on the tuned 1024-query tile.
BIG_NI_ROWS = int(os.environ.get("ANALITICCL_BT_ROWS", 262_144))
BIG_NI_B_TILE = int(os.environ.get("ANALITICCL_BT", 256))


def _b_tile(B: int, Ni: int = 0) -> int:
    bt = min(B, BIG_NI_B_TILE if Ni >= BIG_NI_ROWS else B_TILE)
    # the kernels require B % bt == 0; env-supplied tiles (ANALITICCL_BT)
    # that don't divide the batch bucket are rounded down to the largest
    # power of two that does (B buckets are powers of two, so any pow2 <= B
    # divides it)
    while bt > 1 and B % bt != 0:
        bt = 1 << ((bt - 1).bit_length() - 1)
    return max(bt, 1)


def _pack_bits_rows_i32(mask_t: jnp.ndarray) -> jnp.ndarray:
    """[R, B] bool -> [R/8, B] int32 bytes: bit r%8 of byte r//8 is row r."""
    R, B = mask_t.shape
    m = mask_t.reshape(R // 8, 8, B).astype(jnp.int32)
    weights = (1 << jnp.arange(8, dtype=jnp.int32))[None, :, None]
    return jnp.sum(m * weights, axis=1)


def _stage_a_kernel(
    start_ref,  # [nqt] int32 scalar-prefetch: per-tile band start block
    qbin_ref,  # [BT, AT] int8
    q_cc_ref,  # [1, BT] int32
    k_ana_ref,  # [1, BT] int32
    k_len_ref,  # [1, BT] int32: min(k_ana, k_ed) — the length-difference cap
    bins_ref,  # [RB, AT] int8 (band block start_ref[j] + i)
    cc_ref,  # [RB, 1] int32
    packed_ref,  # [BT, RB/8] uint8 (query-major, banded coords)
    exact_ref,  # [BT, RB/8] uint8 (query-major, banded coords)
    counts_ref,  # [RB/128, BT] int32 (lex-major, banded coords)
    nmatch_ref,  # [1, BT] int32 (accumulated across the band grid dim)
    nexact_ref,  # [1, BT] int32 (accumulated)
):
    # grid is (query tiles, band blocks) with the band dim innermost so the
    # per-query accumulators keep their block across the sweep
    i = pl.program_id(1)
    dot = jax.lax.dot_general(
        bins_ref[...],
        qbin_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [RB, B]
    l1 = cc_ref[...] + q_cc_ref[0][None, :] - 2 * dot
    # |charcount difference| = |norm length difference| <= DL, so candidates
    # past the per-query edit threshold can NEVER survive stage B's ld <=
    # k_ed filter (lib.rs:1350-1378); dropping them here shrinks the pair
    # list (and the caller's band) from +-k_ana to +-min(k_ana, k_ed) —
    # 2 vs 3 on the default thresholds
    ccd = cc_ref[...] - q_cc_ref[0][None, :]
    mask = (l1 <= k_ana_ref[0][None, :]) & (
        jnp.abs(ccd) <= k_len_ref[0][None, :]
    )
    exact = l1 == 0

    # pack lex-major (the natural orientation of the [RB, B] tile), then
    # transpose the small int32 tile in VMEM before narrowing to u8 — this
    # emits the q-major layout directly instead of a post-hoc HBM transpose
    packed_ref[...] = _pack_bits_rows_i32(mask).T.astype(jnp.uint8)
    exact_ref[...] = _pack_bits_rows_i32(exact).T.astype(jnp.uint8)
    RB, B = mask.shape
    counts_ref[...] = (
        mask.reshape(RB // 128, 128, B).astype(jnp.int32).sum(axis=1)
    )

    @pl.when(i == 0)
    def _():
        nmatch_ref[...] = jnp.zeros_like(nmatch_ref)
        nexact_ref[...] = jnp.zeros_like(nexact_ref)

    nmatch_ref[0] += mask.astype(jnp.int32).sum(axis=0)
    nexact_ref[0] += exact.astype(jnp.int32).sum(axis=0)


def stage_a_masks_pallas(
    bins, cc, qbin, q_cc, k_ana, k_len, start_blk, nb_band: int,
    interpret: bool = False,
):
    """Fused banded Pallas path (TPU). Shapes: bins [Ni, AT] int8 (charcount-
    sorted), cc [Ni] int32, qbin [B, AT] int8, q_cc/k_ana/k_len [B] int32,
    start_blk [B // B_TILE] int32 (band start block per query tile; must
    satisfy (start + nb_band) * ROW_BLOCK <= Ni). Ni must divide by
    ROW_BLOCK. Padded lexicon rows must carry a huge cc so they never match.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests)."""
    Ni, AT = bins.shape
    B = qbin.shape[0]
    rb = _row_block(B)
    bt = _b_tile(B, Ni)
    assert Ni % rb == 0 and B % bt == 0
    assert nb_band * rb <= Ni
    nqt = B // bt
    assert start_blk.shape == (nqt,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nqt, nb_band),
        in_specs=[
            pl.BlockSpec((bt, AT), lambda j, i, s: (j, 0)),
            pl.BlockSpec((1, bt), lambda j, i, s: (0, j)),
            pl.BlockSpec((1, bt), lambda j, i, s: (0, j)),
            pl.BlockSpec((1, bt), lambda j, i, s: (0, j)),
            pl.BlockSpec((rb, AT), lambda j, i, s: (s[j] + i, 0)),
            pl.BlockSpec((rb, 1), lambda j, i, s: (s[j] + i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, rb // 8), lambda j, i, s: (j, i)),
            pl.BlockSpec((bt, rb // 8), lambda j, i, s: (j, i)),
            pl.BlockSpec((rb // 128, bt), lambda j, i, s: (i, j)),
            pl.BlockSpec((1, bt), lambda j, i, s: (0, j)),
            pl.BlockSpec((1, bt), lambda j, i, s: (0, j)),
        ],
    )
    Nb = nb_band * rb
    out = pl.pallas_call(
        _stage_a_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Nb // 8), jnp.uint8),
            jax.ShapeDtypeStruct((B, Nb // 8), jnp.uint8),
            jax.ShapeDtypeStruct((Nb // 128, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
    )(
        start_blk.astype(jnp.int32),
        qbin,
        q_cc.reshape(1, B),
        k_ana.reshape(1, B),
        k_len.reshape(1, B),
        bins,
        cc.reshape(Ni, 1),
    )
    packed_q, exact_q, counts_t, nmatch, nexact = out
    return packed_q, exact_q, counts_t, nmatch[0], nexact[0]


def stage_a_masks_xla(
    bins, cc, validrows, qbin, q_cc, k_ana, k_len, start_blk, nb_band: int
):
    """XLA fallback with identical banded outputs (CPU backend)."""
    Ni, AT = bins.shape
    B = qbin.shape[0]
    rb = _row_block(B)
    bt = _b_tile(B, Ni)
    nqt = B // bt
    Nb = nb_band * rb

    def tile(args):
        qb, qc, ka, kl, sb = args
        sr = sb * rb
        bins_b = jax.lax.dynamic_slice_in_dim(bins, sr, Nb, 0)
        cc_b = jax.lax.dynamic_slice_in_dim(cc, sr, Nb, 0)
        vr_b = jax.lax.dynamic_slice_in_dim(validrows, sr, Nb, 0)
        summin = jax.lax.dot_general(
            bins_b, qb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [Nb, bt]
        l1 = cc_b[:, None] + qc[None, :] - 2 * summin
        ccd = cc_b[:, None] - qc[None, :]
        mask = (
            (l1 <= ka[None, :])
            & (jnp.abs(ccd) <= kl[None, :])
            & vr_b[:, None]
        )
        exact = (l1 == 0) & vr_b[:, None]
        packed_q = _pack_bits_rows_i32(mask).T.astype(jnp.uint8)
        exact_q = _pack_bits_rows_i32(exact).T.astype(jnp.uint8)
        counts = mask.reshape(Nb // 128, 128, bt).astype(jnp.int32).sum(axis=1)
        return (
            packed_q,
            exact_q,
            counts,
            mask.astype(jnp.int32).sum(axis=0),
            exact.astype(jnp.int32).sum(axis=0),
        )

    if nqt == 1:
        packed_q, exact_q, counts, nmatch, nexact = tile(
            (qbin, q_cc, k_ana, k_len, start_blk[0])
        )
        return packed_q, exact_q, counts, nmatch, nexact
    outs = jax.lax.map(
        tile,
        (
            qbin.reshape(nqt, bt, AT),
            q_cc.reshape(nqt, bt),
            k_ana.reshape(nqt, bt),
            k_len.reshape(nqt, bt),
            start_blk,
        ),
    )
    packed_q = outs[0].reshape(B, Nb // 8)
    exact_q = outs[1].reshape(B, Nb // 8)
    # per-tile counts are [nqt, Nb/128, bt]; lex-major global layout has
    # column q carrying its own tile's band: transpose tiles to columns
    counts_t = jnp.moveaxis(outs[2], 0, 1).reshape(Nb // 128, B)
    nmatch = outs[3].reshape(B)
    nexact = outs[4].reshape(B)
    return packed_q, exact_q, counts_t, nmatch, nexact
