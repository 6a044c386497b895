"""The batched device query pipeline: retrieval -> scoring -> ranking.

TPU-native replacement for the reference's per-query hot loops
(find_nearest_anahashes lib.rs:1143-1308, gather_instances lib.rs:1311-1402,
and the scoring half of score_and_rank lib.rs:1405-1503):

Stage A — retrieval. Candidate set = all indexed entries whose count vector is
within L1 distance <= k of the query's. Computed as a *binarized matmul* on
the MXU: expanding counts into per-(char, threshold) binary planes makes
``sum(min(a, q))`` an inner product, so

    L1(a, q) = cc(a) + cc(q) - 2 * (bin(a) . bin(q))

One [B, A*T] x [A*T, N] int8 matmul scores every query against the entire
lexicon. The boolean hit mask is then *compacted* into a flat (query,
candidate) pair list with a cumsum+scatter, so downstream DP work is
proportional to the number of real candidates rather than a padded per-query
budget. StopAtExactMatch restricts a query's mask to exact anagram hits
(lib.rs:1158-1174).

Stage B — scoring. Gather each pair's normalized strings, run the fused
DL+LCS+prefix/suffix DP (ops/dl_jax.py), compute the weighted linear score
(lib.rs:1430-1452), mask by per-query max edit distance and score threshold,
and sort pairs by (query, kept desc, score desc, freq desc, canonical index
asc) — the reference's stable rank order per query. The top R survivors per
query return to the host, where the exact float64 ranking tail (crop/cutoff/
confusables/variant expansion; models/variant_model.py) runs on these few
results.

Exactness notes:
  * the L1-ball candidate set is exactly the set the reference's deletion BFS
    + insertion sweep visits (see SURVEY.md §7);
  * device scores are float32 and used only for *selection*; the host
    recomputes float64 scores from the exact integer metrics. The device
    threshold uses a small slack so float32 rounding cannot drop a candidate
    the float64 threshold would keep.
"""

from __future__ import annotations

import sys
from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .dl_jax import PAD_A, PAD_B, dl_metrics_batch
from ..types import Distance, SearchParameters, StopCriterion, VariantResult

BIG_L1 = np.int32(1 << 28)
THRESHOLD_SLACK = 1e-4

# static shape buckets
B_BUCKETS = (8, 64, 256)
P_BUCKETS = (2048, 16384, 131072)


def _bucket(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


class DevicePipeline:
    """Device-resident index + jitted query stages for one built model."""

    def __init__(self, model):
        index = model.index
        assert index is not None
        self.model = model
        self.A = model.alphabet_size()
        self.Ni = index.size
        self.L = max(8, index.max_norm_len)
        counts = index.counts.astype(np.int32)
        self.T = max(1, int(counts.max())) if counts.size else 1

        Ni_pad = max(128, -(-self.Ni // 128) * 128)
        self.Ni_pad = Ni_pad
        pad = Ni_pad - self.Ni

        t_levels = np.arange(self.T, dtype=np.int32)[None, None, :]
        bins = (counts[:, :, None] > t_levels).reshape(self.Ni, self.A * self.T)
        bins = np.pad(bins, ((0, pad), (0, 0))).astype(np.int8)
        cc = np.pad(index.charcounts, (0, pad), constant_values=BIG_L1)
        norms = np.pad(
            index.norms.astype(np.int32),
            ((0, pad), (0, self.L - index.norms.shape[1])),
        )
        norm_lens = np.pad(index.norm_lens, (0, pad))
        freqs = np.pad(index.freqs.astype(np.float32), (0, pad))
        first_lower = np.pad(index.first_lower, (0, pad))

        self.bins = jnp.asarray(bins)
        self.cc = jnp.asarray(cc.astype(np.int32))
        self.norms = jnp.asarray(norms)
        self.norm_lens = jnp.asarray(norm_lens.astype(np.int32))
        self.freqs = jnp.asarray(freqs)
        self.first_lower = jnp.asarray(first_lower)
        self.valid = jnp.asarray(np.arange(Ni_pad) < self.Ni)

        # index arrays bundled as explicit jit arguments so executables are
        # shared across models of identical shape and nothing is constant-baked
        self._idx_a = (self.bins, self.cc, self.valid)
        self._idx_b = (self.norms, self.norm_lens, self.freqs, self.first_lower)

    # ------------------------------------------------------------------
    # Stage A: L1-ball retrieval via binarized matmul + pair compaction
    # ------------------------------------------------------------------

    def _stage_a(self, qbin, q_cc, k_ana, stop_exact, P: int):
        return _stage_a_jit(*self._idx_a, qbin, q_cc, k_ana, stop_exact, P=P)

    def _stage_b(self, pair_flat, q_norms, q_lens, q_first_lower, k_ed,
                 weights, score_threshold, have_freq, P: int, R: int):
        return _stage_b_jit(
            *self._idx_b, pair_flat, q_norms, q_lens, q_first_lower, k_ed,
            weights, score_threshold, have_freq, P=P, R=R,
        )


    # ------------------------------------------------------------------
    # Host driver
    # ------------------------------------------------------------------

    def find_variants_batch(
        self, inputs: Sequence[str], params: SearchParameters
    ) -> List[List[VariantResult]]:
        model = self.model
        enc = model.enc
        n = len(inputs)
        results: List[Optional[List[VariantResult]]] = [None] * n

        active: List[int] = []
        norms: List[List[int]] = []
        for i, text in enumerate(inputs):
            norm = enc.normalize(text)
            if not norm:
                results[i] = []
            elif len(norm) > self.L:
                results[i] = model._find_variants_oracle(text, params)
            else:
                active.append(i)
                norms.append(norm)
        if not active:
            return [r if r is not None else [] for r in results]

        B = _bucket(len(active), B_BUCKETS)
        A, T, L = self.A, self.T, self.L
        q_counts = np.zeros((B, A), dtype=np.int32)
        q_norms = np.zeros((B, L), dtype=np.int32)
        q_lens = np.zeros(B, dtype=np.int32)
        q_first_lower = np.zeros(B, dtype=bool)
        k_ana = np.full(B, -1, dtype=np.int32)  # padding rows match nothing
        k_ed = np.zeros(B, dtype=np.int32)
        for row, i in enumerate(active):
            text = inputs[i]
            q_counts[row] = enc.count_vector(text).astype(np.int32)
            nm = norms[row]
            q_norms[row, : len(nm)] = nm
            q_lens[row] = len(nm)
            q_first_lower[row] = text[:1].islower() if text else False
            ka, ke = model._resolve_distances(len(nm), params)
            k_ana[row] = ka
            k_ed[row] = ke

        t_levels = np.arange(T, dtype=np.int32)[None, None, :]
        qbin = (
            (np.minimum(q_counts, T)[:, :, None] > t_levels)
            .reshape(B, A * T)
            .astype(np.int8)
        )
        q_cc = q_counts.sum(axis=1).astype(np.int32)
        stop_exact = np.full(
            B, params.stop_criterion is StopCriterion.STOP_AT_EXACT_MATCH
        )

        # Stage A with escalating pair budgets
        P = P_BUCKETS[0]
        while True:
            pair_flat, n_match = self._stage_a(
                jnp.asarray(qbin),
                jnp.asarray(q_cc),
                jnp.asarray(k_ana),
                jnp.asarray(stop_exact),
                P=P,
            )
            total = int(jnp.sum(n_match))
            if total <= P or P >= P_BUCKETS[-1]:
                if total > P and model.debug:
                    print(
                        f"WARNING: pair budget overflow ({total} > {P}); "
                        "farthest candidates dropped",
                        file=sys.stderr,
                    )
                break
            P = _bucket(total, P_BUCKETS)

        w = model.weights
        weights_arr = jnp.asarray(
            np.array(
                [w.ld, w.lcs, w.prefix, w.suffix, w.case, w.sum()], dtype=np.float32
            )
        )
        R = max(64, 2 * params.max_matches) if params.max_matches > 0 else P
        (s_q, s_cand, s_ld, s_lcs, s_pf, s_sf, s_case, out_mask, n_keep, max_freq) = (
            self._stage_b(
                pair_flat,
                jnp.asarray(q_norms),
                jnp.asarray(q_lens),
                jnp.asarray(q_first_lower),
                jnp.asarray(k_ed),
                weights_arr,
                jnp.float32(params.score_threshold),
                jnp.asarray(model.have_freq),
                P=P,
                R=min(R, P),
            )
        )
        s_q = np.asarray(s_q)
        s_cand = np.asarray(s_cand)
        s_ld = np.asarray(s_ld)
        s_lcs = np.asarray(s_lcs)
        s_pf = np.asarray(s_pf)
        s_sf = np.asarray(s_sf)
        s_case = np.asarray(s_case)
        out_mask = np.asarray(out_mask)
        n_keep = np.asarray(n_keep)
        max_freq = np.asarray(max_freq)
        vocab_ids = self.model.index.vocab_ids

        kept_rows = np.nonzero(out_mask)[0]
        per_query: List[List[int]] = [[] for _ in range(B)]
        for rowidx in kept_rows:
            per_query[s_q[rowidx]].append(int(rowidx))

        for row, i in enumerate(active):
            entries = per_query[row]
            # rebuild instances in canonical gather order for the exact host tail
            entries.sort(key=lambda p: s_cand[p])
            instances: List[Tuple[int, Distance]] = [
                (
                    int(vocab_ids[s_cand[p]]),
                    Distance(
                        ld=int(s_ld[p]),
                        lcs=int(s_lcs[p]),
                        prefixlen=int(s_pf[p]),
                        suffixlen=int(s_sf[p]),
                        samecase=bool(s_case[p]),
                    ),
                )
                for p in entries
            ]
            max_freq_floor = (
                float(max_freq[row]) if int(n_keep[row]) > len(entries) else 0.0
            )
            results[i] = model.score_and_rank(
                instances,
                inputs[i],
                int(q_lens[row]),
                params.max_matches,
                params.score_threshold,
                params.cutoff_threshold,
                params.freq_weight,
                max_freq_floor=max_freq_floor,
            )
        return [r if r is not None else [] for r in results]


@partial(jax.jit, static_argnames=("P",))
def _stage_a_jit(bins, cc, validrows, qbin, q_cc, k_ana, stop_exact, P: int):
    B = qbin.shape[0]
    Ni_pad = bins.shape[0]
    summin = jax.lax.dot_general(
        qbin,
        bins,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, Ni_pad]
    l1 = cc[None, :] + q_cc[:, None] - 2 * summin
    valid = validrows[None, :]
    mask = (l1 <= k_ana[:, None]) & valid
    exact = (l1 == 0) & valid
    has_exact = exact.any(axis=1)
    use_exact = stop_exact & has_exact
    mask = jnp.where(use_exact[:, None], exact, mask)
    n_match = mask.sum(axis=1)

    # compact the hit mask into a flat pair list, preserving
    # (query, canonical candidate index) order
    flat_mask = mask.reshape(-1)
    positions = jnp.cumsum(flat_mask) - 1
    flat_idx = jnp.arange(B * Ni_pad, dtype=jnp.int32)
    target = jnp.where(flat_mask, positions, P)
    sentinel = jnp.int32(B * Ni_pad)
    pair_flat = jnp.full((P,), sentinel, dtype=jnp.int32)
    pair_flat = pair_flat.at[target].set(flat_idx, mode="drop")
    return pair_flat, n_match


# ---------------------------------------------------------------------------
# Stage B: DL scoring + per-query ranking over the flat pair list
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("P", "R"))
def _stage_b_jit(
    norms,
    norm_lens,
    freqs,
    first_lower,
    pair_flat,  # int32 [P]; sentinel = B*Ni_pad
    q_norms,  # int32 [B, L] (0-padded)
    q_lens,  # int32 [B]
    q_first_lower,  # bool [B]
    k_ed,  # int32 [B]
    weights,  # f32 [6]: ld, lcs, prefix, suffix, case, sum
    score_threshold,  # f32 scalar
    have_freq,  # bool scalar
    P: int,
    R: int,
):
    B = q_norms.shape[0]
    Ni_pad = norms.shape[0]
    L = norms.shape[1]
    sentinel = jnp.int32(B * Ni_pad)
    pvalid = pair_flat < sentinel
    pq = jnp.where(pvalid, pair_flat // Ni_pad, B)  # query row; B = dump
    pc = jnp.where(pvalid, pair_flat % Ni_pad, 0)  # candidate row

    cn = norms[pc]  # [P, L]
    cl = jnp.where(pvalid, norm_lens[pc], 0)
    cf = freqs[pc]
    cfl = first_lower[pc]

    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    qn = q_norms[jnp.minimum(pq, B - 1)]
    ql = jnp.where(pvalid, q_lens[jnp.minimum(pq, B - 1)], 0)
    a = jnp.where(pos < ql[:, None], qn, PAD_A)
    b = jnp.where(pos < cl[:, None], cn, PAD_B)

    ld, lcs, pf, sf = dl_metrics_batch(a, ql, b, cl, L)

    w_ld, w_lcs, w_pf, w_sf, w_case, w_sum = (
        weights[0], weights[1], weights[2], weights[3], weights[4], weights[5],
    )
    lcs = jnp.where(w_lcs > 0, lcs, 0)
    pf = jnp.where(w_pf > 0, pf, 0)
    sf = jnp.where(w_sf > 0, sf, 0)
    samecase = jnp.where(
        w_case > 0, cfl == q_first_lower[jnp.minimum(pq, B - 1)], True
    )

    qlen_f = jnp.maximum(ql, 1).astype(jnp.float32)
    ds = jnp.where(ld > ql, 0.0, 1.0 - ld.astype(jnp.float32) / qlen_f)
    score = (
        w_ld * ds
        + w_lcs * lcs.astype(jnp.float32) / qlen_f
        + w_pf * pf.astype(jnp.float32) / qlen_f
        + w_sf * sf.astype(jnp.float32) / qlen_f
        + jnp.where(samecase, w_case, 0.0)
    ) / w_sum

    pass_ed = pvalid & (ld <= k_ed[jnp.minimum(pq, B - 1)])
    keep_strict = pass_ed & (score >= score_threshold)
    keep = pass_ed & (score >= score_threshold - THRESHOLD_SLACK)

    freq = jnp.where(have_freq, cf, 1.0)
    max_freq = jax.ops.segment_max(
        jnp.where(keep_strict, freq, 0.0), pq, num_segments=B + 1
    )[:B]
    n_keep = jax.ops.segment_sum(
        keep.astype(jnp.int32), pq, num_segments=B + 1
    )[:B]

    # rank within each query group; non-kept pairs sink to the group's end
    sort_q = jnp.where(keep, pq, B)
    (s_q, _nk, s_score_neg, s_freq_neg, s_cand, s_ld, s_lcs, s_pf, s_sf, s_case) = (
        jax.lax.sort(
            (
                sort_q,
                (~keep).astype(jnp.int32),
                -score,
                -freq,
                pc,
                ld,
                lcs,
                pf,
                sf,
                samecase.astype(jnp.int32),
            ),
            dimension=0,
            num_keys=5,
        )
    )
    arange = jnp.arange(P, dtype=jnp.int32)
    first_pos = jax.ops.segment_min(arange, s_q, num_segments=B + 1)
    rank = arange - first_pos[jnp.minimum(s_q, B)]
    out_mask = (s_q < B) & (rank < R)
    return (
        s_q,
        s_cand,
        s_ld,
        s_lcs,
        s_pf,
        s_sf,
        s_case,
        out_mask,
        n_keep,
        max_freq,
    )



def get_device_pipeline(model) -> DevicePipeline:
    return DevicePipeline(model)
