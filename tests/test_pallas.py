"""Direct tests of the Pallas TPU kernels (interpret mode on CPU).

CI runs on the CPU backend, where the production pipeline takes the XLA
fallbacks — so these tests exercise the Pallas kernels explicitly through the
Pallas interpreter, which executes the same kernel program (including the
bit-packing layout and the banded DP) without TPU hardware:

  * ``dl_lcs_pallas`` vs ``dl_metrics_windowed`` (XLA) vs the scalar oracle,
    under the windowed-exactness contract of dl_jax.py: values are exact
    whenever the true DL <= window, and merely ">window" otherwise — so the
    comparison clips every implementation at window+1.
  * ``stage_a_masks_pallas`` vs ``stage_a_masks_xla`` bit-for-bit (the packing
    order in _pack_bits_rows is the risk surface).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from analiticcl_tpu.ops import distance as oracle
from analiticcl_tpu.ops.dl_jax import PAD_A, PAD_B, dl_metrics_windowed
from analiticcl_tpu.ops.dl_pallas import BLOCK, dl_lcs_pallas
from analiticcl_tpu.ops.stage_a import stage_a_masks_pallas, stage_a_masks_xla


def _random_pairs(rng, P, L, sigma):
    """Random padded pairs with clustered characters so edits stay small."""
    a = np.full((P, L), PAD_A, dtype=np.int32)
    b = np.full((P, L), PAD_B, dtype=np.int32)
    al = rng.integers(0, L + 1, size=P).astype(np.int32)
    bl = np.zeros(P, dtype=np.int32)
    for p in range(P):
        base = rng.integers(1, sigma + 1, size=al[p])
        a[p, : al[p]] = base
        # derive b from a by a few random edits (keeps many DLs inside the
        # window) or draw it independently (exercises the >window branch)
        if rng.random() < 0.7 and al[p] > 0:
            s = list(base)
            for _ in range(rng.integers(0, 4)):
                op = rng.integers(0, 4)
                if op == 0 and len(s) < L:
                    s.insert(rng.integers(0, len(s) + 1), rng.integers(1, sigma + 1))
                elif op == 1 and s:
                    s.pop(rng.integers(0, len(s)))
                elif op == 2 and s:
                    s[rng.integers(0, len(s))] = rng.integers(1, sigma + 1)
                elif op == 3 and len(s) >= 2:
                    i = rng.integers(0, len(s) - 1)
                    s[i], s[i + 1] = s[i + 1], s[i]
            s = s[:L]
        else:
            s = list(rng.integers(1, sigma + 1, size=rng.integers(0, L + 1)))
        bl[p] = len(s)
        b[p, : len(s)] = s
    return a, al, b, bl


# interpret-mode cost grows with the unrolled program (the interpreter
# traces and lowers the whole DP, so runtime scales with program size, not
# data). The sliced-slab transposition restructure in dl_pallas.py keeps the
# production W=12 bucket CI-viable: (12, 14) is the smallest config that
# exercises ring wraparound at W=12 (ring depth R=15; rows written up to
# L+1=15 reuse slot 0) plus the margin clears and the d+s prune (~1 min).
# The non-production (5, 12) midpoint stays opt-in via ANALITICCL_SLOW_TESTS.
_SLOW = pytest.mark.skipif(
    not os.environ.get("ANALITICCL_SLOW_TESTS"),
    reason="redundant midpoint config; set ANALITICCL_SLOW_TESTS=1",
)


def _check_pallas_vs_oracle(window, L, seed, check_xla):
    rng = np.random.default_rng(seed)
    P = BLOCK  # one grid step keeps interpret mode fast
    a, al, b, bl = _random_pairs(rng, P, L, sigma=6)

    ld_p, lcs_p = dl_lcs_pallas(
        jnp.asarray(a), jnp.asarray(al), jnp.asarray(b), jnp.asarray(bl),
        L, window, interpret=True,
    )
    ld_p, lcs_p = np.asarray(ld_p), np.asarray(lcs_p)
    if check_xla:
        ld_x, lcs_x, _, _ = dl_metrics_windowed(
            jnp.asarray(a), jnp.asarray(al), jnp.asarray(b), jnp.asarray(bl),
            L, window,
        )
        ld_x, lcs_x = np.asarray(ld_x), np.asarray(lcs_x)
        # LCS has no banding: exact everywhere, and identical across kernels
        np.testing.assert_array_equal(lcs_p, lcs_x)
    # DL under the windowed contract: clip at window+1 and compare to truth
    clip = window + 1
    for p in range(P):
        sa = [int(x) for x in a[p, : al[p]]]
        sb = [int(x) for x in b[p, : bl[p]]]
        true_ld = oracle.damerau_levenshtein(sa, sb, 4 * L)
        true_lcs = oracle.longest_common_substring_length(sa, sb)
        assert lcs_p[p] == true_lcs, (p, sa, sb)
        want = min(true_ld, clip)
        assert min(int(ld_p[p]), clip) == want, (p, sa, sb, int(ld_p[p]), true_ld)
        if check_xla:
            assert min(int(ld_x[p]), clip) == want, (
                p, sa, sb, int(ld_x[p]), true_ld,
            )


@pytest.mark.parametrize(
    "window,L,seed",
    [(3, 8, 0), (3, 16, 1), (5, 10, 3), pytest.param(5, 12, 2, marks=_SLOW)],
)
def test_dl_lcs_pallas_matches_xla_and_oracle(window, L, seed):
    _check_pallas_vs_oracle(window, L, seed, check_xla=True)


def test_dl_lcs_pallas_window12_matches_oracle():
    """The production W=12 bucket (WINDOW_BUCKETS in ops/pipeline.py): ring
    wraparound (R=15, rows written up to L+1=15 reuse slot 0), margin clears,
    and the d+s <= W+1 transposition prune, vs the scalar oracle. The XLA
    cross-check is skipped — its W=12 CPU compile costs ~1 min on the 1-core
    CI box and the XLA path is already cross-checked at windows 3/5."""
    _check_pallas_vs_oracle(12, 14, 4, check_xla=False)


def test_dl_lcs_pallas_empty_sides():
    L, window = 8, 3
    P = BLOCK
    a = np.full((P, L), PAD_A, dtype=np.int32)
    b = np.full((P, L), PAD_B, dtype=np.int32)
    al = np.zeros(P, dtype=np.int32)
    bl = np.zeros(P, dtype=np.int32)
    # pair 0: both empty; pair 1: a empty; pair 2: b empty
    b[1, :3] = [1, 2, 3]
    bl[1] = 3
    a[2, :2] = [4, 5]
    al[2] = 2
    ld, lcs = dl_lcs_pallas(
        jnp.asarray(a), jnp.asarray(al), jnp.asarray(b), jnp.asarray(bl),
        L, window, interpret=True,
    )
    ld = np.asarray(ld)
    assert ld[0] == 0 and ld[1] == 3 and ld[2] == 2
    assert np.asarray(lcs)[:3].tolist() == [0, 0, 0]


@pytest.mark.parametrize("seed,B", [(0, 8), (1, 64)])
def test_stage_a_pallas_matches_xla_bit_for_bit(seed, B):
    rng = np.random.default_rng(seed)
    Ni = 2048  # two ROW_BLOCK grid steps
    A, T = 6, 3
    AT = A * T
    counts = rng.integers(0, T + 1, size=(Ni, A)).astype(np.int32)
    t_levels = np.arange(T, dtype=np.int32)[None, None, :]
    bins = (counts[:, :, None] > t_levels).reshape(Ni, AT).astype(np.int8)
    cc = counts.sum(axis=1).astype(np.int32)
    # mark a padded tail the way DevicePipeline does: huge cc, zero bins
    n_real = Ni - 137
    bins[n_real:] = 0
    cc[n_real:] = np.int32(1 << 28)
    validrows = np.arange(Ni) < n_real

    qc = rng.integers(0, T + 1, size=(B, A)).astype(np.int32)
    qbin = (qc[:, :, None] > t_levels).reshape(B, AT).astype(np.int8)
    q_cc = qc.sum(axis=1).astype(np.int32)
    k_ana = rng.integers(0, 4, size=B).astype(np.int32)
    k_ana[0] = -1  # padding-row convention: matches nothing
    # independent length cap (min(k_ana, k_ed) in production): exercises the
    # |charcount difference| filter the kernel applies on top of the L1 test
    k_len = np.minimum(k_ana, rng.integers(0, 4, size=B).astype(np.int32))

    # full-scan band: start block 0, width = whole (padded) lexicon
    start_blk = jnp.zeros(1, dtype=jnp.int32)
    nb_band = Ni // 1024
    args = (
        jnp.asarray(qbin), jnp.asarray(q_cc), jnp.asarray(k_ana),
        jnp.asarray(k_len),
    )
    p_packed, p_exact, p_counts, p_nm, p_ne = stage_a_masks_pallas(
        jnp.asarray(bins), jnp.asarray(cc), *args, start_blk, nb_band,
        interpret=True,
    )
    x_packed, x_exact, x_counts, x_nm, x_ne = stage_a_masks_xla(
        jnp.asarray(bins), jnp.asarray(cc), jnp.asarray(validrows), *args,
        start_blk, nb_band,
    )
    np.testing.assert_array_equal(np.asarray(p_packed), np.asarray(x_packed))
    np.testing.assert_array_equal(np.asarray(p_exact), np.asarray(x_exact))
    np.testing.assert_array_equal(np.asarray(p_counts), np.asarray(x_counts))
    np.testing.assert_array_equal(np.asarray(p_nm), np.asarray(x_nm))
    np.testing.assert_array_equal(np.asarray(p_ne), np.asarray(x_ne))

    # and against a direct numpy L1 computation
    l1 = np.abs(counts[:, None, :] - qc[None, :, :]).sum(axis=2)  # [Ni, B]
    ccd = np.abs(cc[:, None].astype(np.int64) - q_cc[None, :])
    mask = (
        (l1 <= k_ana[None, :]) & (ccd <= k_len[None, :]) & validrows[:, None]
    )
    np.testing.assert_array_equal(np.asarray(x_nm), mask.sum(axis=0))

    # banded window [1024, 2048): both backends agree bit-for-bit and match
    # numpy restricted to the same rows
    start_b = jnp.ones(1, dtype=jnp.int32)
    pb = stage_a_masks_pallas(
        jnp.asarray(bins), jnp.asarray(cc), *args, start_b, 1, interpret=True
    )
    xb = stage_a_masks_xla(
        jnp.asarray(bins), jnp.asarray(cc), jnp.asarray(validrows), *args,
        start_b, 1,
    )
    for p_arr, x_arr in zip(pb, xb):
        np.testing.assert_array_equal(np.asarray(p_arr), np.asarray(x_arr))
    np.testing.assert_array_equal(
        np.asarray(xb[3]), mask[1024:2048].sum(axis=0)
    )


def test_stage_a_multi_tile_matches_single_tile(monkeypatch):
    """nqt > 1 (the large-lexicon small-tile path, stage_a._b_tile): per-tile
    band starts select DIFFERENT block windows per query tile, and both
    backends must agree bit-for-bit with a numpy oracle restricted to each
    tile's band. Forces bt=16 via the BIG_NI threshold so B=64 -> 4 tiles."""
    from analiticcl_tpu.ops import stage_a

    monkeypatch.setattr(stage_a, "BIG_NI_ROWS", 1024)
    monkeypatch.setattr(stage_a, "BIG_NI_B_TILE", 16)
    rng = np.random.default_rng(7)
    Ni, B, A, T = 4096, 64, 6, 3
    AT = A * T
    counts = rng.integers(0, T + 1, size=(Ni, A)).astype(np.int32)
    # charcount-sorted device layout, as DevicePipeline builds it
    counts = counts[np.argsort(counts.sum(axis=1), kind="stable")]
    t_levels = np.arange(T, dtype=np.int32)[None, None, :]
    bins = (counts[:, :, None] > t_levels).reshape(Ni, AT).astype(np.int8)
    cc = counts.sum(axis=1).astype(np.int32)
    validrows = np.ones(Ni, dtype=bool)

    qc = rng.integers(0, T + 1, size=(B, A)).astype(np.int32)
    qc = qc[np.argsort(qc.sum(axis=1), kind="stable")]  # cc-sorted queries
    qbin = (qc[:, :, None] > t_levels).reshape(B, AT).astype(np.int8)
    q_cc = qc.sum(axis=1).astype(np.int32)
    k_ana = rng.integers(0, 4, size=B).astype(np.int32)
    k_len = k_ana  # no extra length cap: band plan below keys off k_ana

    # exact per-tile band plan (mirrors DevicePipeline._band_plan)
    bt = stage_a._b_tile(B, Ni)
    assert bt == 16 and B // bt == 4
    nqt = B // bt
    lo = (q_cc.reshape(nqt, bt) - k_ana.reshape(nqt, bt)).min(axis=1)
    hi = (q_cc.reshape(nqt, bt) + k_ana.reshape(nqt, bt)).max(axis=1)
    lo_row = np.searchsorted(cc, lo, side="left")
    hi_row = np.searchsorted(cc, hi, side="right")
    start = (lo_row // 1024).astype(np.int32)
    nb_band = int(np.maximum(-(-hi_row // 1024) - start, 1).max())
    start = np.minimum(start, Ni // 1024 - nb_band)

    args = (
        jnp.asarray(qbin), jnp.asarray(q_cc), jnp.asarray(k_ana),
        jnp.asarray(k_len),
    )
    pb = stage_a.stage_a_masks_pallas(
        jnp.asarray(bins), jnp.asarray(cc), *args, jnp.asarray(start),
        nb_band, interpret=True,
    )
    xb = stage_a.stage_a_masks_xla(
        jnp.asarray(bins), jnp.asarray(cc), jnp.asarray(validrows), *args,
        jnp.asarray(start), nb_band,
    )
    for p_arr, x_arr in zip(pb, xb):
        np.testing.assert_array_equal(np.asarray(p_arr), np.asarray(x_arr))

    # numpy oracle: totals over each query's OWN tile band
    l1 = np.abs(counts[:, None, :] - qc[None, :, :]).sum(axis=2)  # [Ni, B]
    mask = l1 <= k_ana[None, :]
    expect = np.zeros(B, dtype=np.int64)
    for q in range(B):
        r0 = start[q // bt] * 1024
        expect[q] = mask[r0 : r0 + nb_band * 1024, q].sum()
    np.testing.assert_array_equal(np.asarray(xb[3]), expect)
