"""Stage A: L1-ball retrieval masks — fused Pallas kernel + XLA fallback.

Computes, for every (query, lexicon row) pair, whether the row lies in the
query's L1 ball, and emits *compact artifacts* instead of materializing the
[B, Ni] distance matrix in HBM:

  * ``packed_q``  uint8 [B, Ni/8]   — hit mask, bit-packed along lexicon rows
  * ``exact_q``   uint8 [B, Ni/8]   — exact-anagram mask (L1 == 0)
  * ``counts_t``  int32 [Ni/128, B] — hits per 128-row lexicon block
    (lex-major: its q-major tile would be 8 lanes wide, below the Mosaic
    minimum; it is small and transposed once in XLA)
  * ``nmatch``/``nexact`` int32 [B] — per-query totals

Outputs are **query-major**: the downstream pair resolution consumes them
row-per-query (radix descent over per-query block counts, one contiguous
u32-word slice per resolved slot), and emitting that layout directly from
the kernel's VMEM tiles replaces what used to be a ~6 ms/batch HBM-level
transposed copy of the packed masks. Bit semantics are unchanged: byte j of
a query row holds lexicon rows 8j..8j+7, bit k <-> row 8j+k (so after a
little-endian bitcast to u32, bit k of word w is row 32w+k).

The kernel tiles the lexicon (grid over row blocks), runs the binarized int8
matmul on the MXU per tile, packs bits and transposes the small tile in
VMEM; HBM traffic is a few bytes per lexicon row instead of the ~4*B*Ni of
the naive XLA formulation (kept as the CPU-backend fallback with identical
outputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 1024  # lexicon rows per grid step
B_TILE = 1024  # queries per grid step (second grid dim tiles wider batches)


def _row_block(B: int) -> int:
    """Rows per grid step. The kernel tiles the query dimension at B_TILE, so
    the [RB, B_TILE] int32 intermediates stay inside scoped VMEM for any B."""
    return ROW_BLOCK


def _pack_bits_rows_i32(mask_t: jnp.ndarray) -> jnp.ndarray:
    """[R, B] bool -> [R/8, B] int32 bytes: bit r%8 of byte r//8 is row r."""
    R, B = mask_t.shape
    m = mask_t.reshape(R // 8, 8, B).astype(jnp.int32)
    weights = (1 << jnp.arange(8, dtype=jnp.int32))[None, :, None]
    return jnp.sum(m * weights, axis=1)


def _stage_a_kernel(
    qbin_ref,  # [BT, AT] int8
    q_cc_ref,  # [1, BT] int32
    k_ana_ref,  # [1, BT] int32
    bins_ref,  # [RB, AT] int8
    cc_ref,  # [RB, 1] int32
    packed_ref,  # [BT, RB/8] uint8 (query-major)
    exact_ref,  # [BT, RB/8] uint8 (query-major)
    counts_ref,  # [RB/128, BT] int32 (lex-major)
    nmatch_ref,  # [1, BT] int32 (accumulated across the lexicon grid dim)
    nexact_ref,  # [1, BT] int32 (accumulated)
):
    # grid is (query tiles, lexicon blocks) with the lexicon dim innermost so
    # the per-query accumulators keep their block across the sweep
    i = pl.program_id(1)
    dot = jax.lax.dot_general(
        bins_ref[...],
        qbin_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [RB, B]
    l1 = cc_ref[...] + q_cc_ref[0][None, :] - 2 * dot
    mask = l1 <= k_ana_ref[0][None, :]
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


def stage_a_masks_pallas(bins, cc, qbin, q_cc, k_ana, interpret: bool = False):
    """Fused Pallas path (TPU). Shapes: bins [Ni, AT] int8, cc [Ni] int32,
    qbin [B, AT] int8, q_cc/k_ana [B] int32. Ni must divide by ROW_BLOCK.
    Padded lexicon rows must carry a huge cc so they never match.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests)."""
    Ni, AT = bins.shape
    B = qbin.shape[0]
    rb = _row_block(B)
    bt = min(B, B_TILE)
    assert Ni % rb == 0 and B % bt == 0
    nblk = Ni // rb
    nqt = B // bt
    out = pl.pallas_call(
        _stage_a_kernel,
        grid=(nqt, nblk),
        in_specs=[
            pl.BlockSpec((bt, AT), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, AT), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (bt, rb // 8), lambda j, i: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bt, rb // 8), lambda j, i: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (rb // 128, bt), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, bt), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Ni // 8), jnp.uint8),
            jax.ShapeDtypeStruct((B, Ni // 8), jnp.uint8),
            jax.ShapeDtypeStruct((Ni // 128, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
    )(qbin, q_cc.reshape(1, B), k_ana.reshape(1, B), bins, cc.reshape(Ni, 1))
    packed_q, exact_q, counts_t, nmatch, nexact = out
    return packed_q, exact_q, counts_t, nmatch[0], nexact[0]


def stage_a_masks_xla(bins, cc, validrows, qbin, q_cc, k_ana):
    """XLA fallback with identical outputs (CPU backend / small models)."""
    summin = jax.lax.dot_general(
        bins, qbin, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # [Ni, B]
    l1 = cc[:, None] + q_cc[None, :] - 2 * summin
    mask = (l1 <= k_ana[None, :]) & validrows[:, None]
    exact = (l1 == 0) & validrows[:, None]
    packed_q = _pack_bits_rows_i32(mask).T.astype(jnp.uint8)
    exact_q = _pack_bits_rows_i32(exact).T.astype(jnp.uint8)
    Ni, B = mask.shape
    counts_t = mask.reshape(Ni // 128, 128, B).astype(jnp.int32).sum(axis=1)
    return (
        packed_q,
        exact_q,
        counts_t,
        mask.astype(jnp.int32).sum(axis=0),
        exact.astype(jnp.int32).sum(axis=0),
    )
