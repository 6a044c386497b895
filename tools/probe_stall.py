"""Per-batch timing probe for the alternating-pass stall (VERDICT r2 #2).

Runs many consecutive 4096-query stream batches on the real TPU and prints
per-batch wall times plus the submit/collect split, so the ~2x slow passes
can be attributed to a stage (host prep, device compute, tunnel transfer,
host ranking) rather than guessed at.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analiticcl_tpu.models.variant_model import VariantModel
from analiticcl_tpu.types import DistanceThreshold, SearchParameters
from analiticcl_tpu.vocab import VocabParams


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def corrupt(word, rng):
    if len(word) < 4:
        return word
    i = rng.randrange(len(word) - 1)
    c = rng.randrange(4)
    if c == 0:
        return word[:i] + word[i + 1 :]
    if c == 1:
        return word[:i] + word[i + 1] + word[i] + word[i + 2 :]
    if c == 2:
        return word[:i] + "x" + word[i:]
    return word[:i] + "q" + word[i + 1 :]


def main():
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
        score_threshold=0.25,
    )
    rng = random.Random(42)
    words = [model.decoder[i].text for i in range(3, len(model.decoder), 7)]
    queries = [corrupt(w, rng) for w in words[:16384]]
    B = int(os.environ.get("PROBE_B", "4096"))
    batches = [queries[i : i + B] for i in range(0, len(queries), B)]

    from analiticcl_tpu.ops.pipeline import get_device_pipeline

    pipe = get_device_pipeline(model)
    # warm compile + budgets
    pipe.collect(pipe.submit(batches[0], params))
    pipe.collect(pipe.submit(batches[0], params))

    import gc
    if "--gcoff" in sys.argv:
        gc.freeze()
        gc.disable()
        log("gc disabled+frozen")
    if "--gcfreeze" in sys.argv:
        gc.collect()
        gc.freeze()
        log(f"gc frozen ({gc.get_freeze_count()} objects); gc stays enabled")
    if "--gcstats" in sys.argv:
        def _cb(phase, info):
            if phase == "start":
                _cb.t0 = time.time()
            else:
                dt = time.time() - _cb.t0
                if dt > 0.01:
                    log(f"    [gc gen{info['generation']} took {1e3*dt:.1f}ms]")
        gc.callbacks.append(_cb)

    # phase 1: serial submit->collect (no pipelining) to isolate per-batch cost
    log("=== serial submit/collect x16 ===")
    for rep in range(4):
        for bi, batch in enumerate(batches):
            t0 = time.time()
            st = pipe.submit(batch, params)
            t1 = time.time()
            pipe.collect(st)
            t2 = time.time()
            log(
                f"rep{rep} b{bi}: submit {1e3*(t1-t0):6.1f}ms "
                f"collect {1e3*(t2-t1):6.1f}ms total {1e3*(t2-t0):6.1f}ms"
            )

    # phase 2: the depth-2 stream exactly as bench.py drives it
    log("=== stream depth-2, 5 passes ===")
    for p in range(5):
        t0 = time.time()
        times = []
        last = t0
        for res in pipe.find_variants_stream(batches, params):
            now = time.time()
            times.append(now - last)
            last = now
        total = time.time() - t0
        per = " ".join(f"{1e3*t:6.1f}" for t in times)
        log(f"pass {p}: total {total:.3f}s  yields(ms): {per}")

    # phase 3: stats breakdown over one more pass
    pipe.stats.clear()
    t0 = time.time()
    for res in pipe.find_variants_stream(batches, params):
        pass
    log(f"stats pass total {time.time()-t0:.3f}s")
    pipe.stats.report()


if __name__ == "__main__":
    main()
