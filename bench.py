"""Benchmark: variant-query throughput on the eng.aspell lexicon.

Reproduces the reference's methodology (performance.md: query a corrupted
word list against a ~120k lexicon, steady-state items/sec) on whatever device
JAX selects (the real TPU under the driver). Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "queries/sec", "vs_baseline": N}

Baseline: 2532 queries/sec — the reference's best published multi-thread
(8-core i7-4770K) throughput (performance.md:106-114, see BASELINE.md).
"""

from __future__ import annotations

import json
import random
import sys
import time


REFERENCE_BASELINE_QPS = 2532.0  # reference v0.3.0 final opts, 8 threads
ALPHABET = "/root/reference/examples/simple.alphabet.tsv"
LEXICON = "/root/reference/examples/eng.aspell.lexicon"


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def corrupt(word: str, rng: random.Random) -> str:
    if len(word) < 4:
        return word
    i = rng.randrange(len(word) - 1)
    choice = rng.randrange(4)
    if choice == 0:  # deletion
        return word[:i] + word[i + 1 :]
    if choice == 1:  # transposition
        return word[:i] + word[i + 1] + word[i] + word[i + 2 :]
    if choice == 2:  # insertion
        return word[:i] + "x" + word[i:]
    return word[:i] + "q" + word[i + 1 :]  # substitution


def main():
    from analiticcl_tpu.models.variant_model import VariantModel
    from analiticcl_tpu.types import DistanceThreshold, SearchParameters
    from analiticcl_tpu.vocab import VocabParams

    t0 = time.time()
    model = VariantModel(alphabet_file=ALPHABET)
    model.read_vocabulary(LEXICON, VocabParams())
    load_s = time.time() - t0

    t0 = time.time()
    model.build()
    build_s = time.time() - t0
    log(
        f"loaded {len(model.decoder)} entries in {load_s:.1f}s; "
        f"index built in {build_s:.1f}s ({model.index.size} instances, "
        f"{len(model.index.group_ranges)} anagram values)"
    )
    model.set_backend("device")

    params = SearchParameters(
        max_anagram_distance=DistanceThreshold.absolute(3),
        max_edit_distance=DistanceThreshold.absolute(2),
        max_matches=10,
        score_threshold=0.25,
    )

    rng = random.Random(42)
    words = [model.decoder[i].text for i in range(3, len(model.decoder), 7)]
    queries = [corrupt(w, rng) for w in words[:16384]]

    # exactness sanity: device results vs the exact host oracle on a sample —
    # full result tuples (text, dist_score, freq_score, via) in order, not
    # just the variant-text set
    sample = queries[:: len(queries) // 200][:200]

    def tuples(res):
        return [
            (model.decoder[r.vocab_id].text, r.dist_score, r.freq_score, r.via)
            for r in res
        ]

    model.set_backend("oracle")
    oracle_res = [tuples(model.find_variants(q, params)) for q in sample]
    model.set_backend("device")
    device_res = [tuples(res) for res in model.find_variants_batch(sample, params)]
    hit = sum(1 for o, d in zip(oracle_res, device_res) if o == d)
    log(
        f"exactness sanity: {hit}/{len(sample)} sampled queries bit-identical "
        "to oracle (scores, order, provenance)"
    )
    if hit < len(sample):
        for q, o, d in zip(sample, oracle_res, device_res):
            if o != d:
                log(f"  MISMATCH {q!r}: oracle={o[:3]} device={d[:3]}")
        raise SystemExit("device/oracle mismatch — benchmark aborted")

    # freeze the model heap: gen-2 GC rescans of the 120k-entry decoder cost
    # ~180 ms every ~5 batches otherwise (the round-2 bimodal stall)
    from analiticcl_tpu.utils.gc_tuning import freeze_model_heap

    frozen = freeze_model_heap()
    log(f"gc: froze {frozen} model-heap objects")

    # 4096-query device batches: the tunnel round trip (~30 ms) and the fixed
    # dispatch cost amortize 4x vs 1024 (measured ~22k vs ~12k q/s median;
    # 8192 measured worse — the pipeline-fill cost dominates at 2 batches)
    B = 4096
    t0 = time.time()
    model.find_variants_batch(queries[:B], params)
    log(f"warmup (compile): {time.time() - t0:.1f}s")
    # second warmup in case the pair budget escalated
    t0 = time.time()
    model.find_variants_batch(queries[:B], params)
    log(f"warm batch: {time.time() - t0:.3f}s")

    # the TPU is remote-attached (~±20% tunnel variance): run ONE continuous
    # warm stream (the reference's steady-state items/sec methodology,
    # performance.md:106-114) and report the MEDIAN of five 16384-query
    # windows — robust to transient load without paying the pipeline-fill
    # latency five times
    N_PASSES = 5
    all_queries = queries * N_PASSES
    passes = []
    t0 = time.time()
    last = t0
    done = 0
    for _res in model.find_variants_stream(all_queries, params, batch_size=B):
        done += 1
        if done % len(queries) == 0:
            now = time.time()
            elapsed = now - last
            run_qps = len(queries) / elapsed
            log(
                f"window {done // len(queries)}: {len(queries)} queries in "
                f"{elapsed:.2f}s = {run_qps:.0f} q/s"
            )
            passes.append(run_qps)
            last = now
    passes.sort()
    qps = passes[len(passes) // 2]
    log(f"median of {len(passes)}: {qps:.0f} q/s (min {passes[0]:.0f}, max {passes[-1]:.0f})")

    print(
        json.dumps(
            {
                "metric": "variant_query_throughput_eng_aspell",
                "value": round(qps, 1),
                "unit": "queries/sec",
                "vs_baseline": round(qps / REFERENCE_BASELINE_QPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
