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
import os
import random
import signal
import subprocess
import sys
import time


REFERENCE_BASELINE_QPS = 2532.0  # reference v0.3.0 final opts, 8 threads
ALPHABET = "/root/reference/examples/simple.alphabet.tsv"
LEXICON = "/root/reference/examples/eng.aspell.lexicon"
CHECKPOINT = os.path.join(os.path.dirname(__file__), "benchmarks", "bench_checkpoint.json")
METRIC = "variant_query_throughput_eng_aspell"


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _git_head() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short=12", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except Exception:
        return "unknown"


def settled_view(passes: list[float], complete: bool) -> tuple[list[int], list[float]]:
    """Steady-state window selection. Leading windows carry the pipeline
    fill and the remote helper's post-compile slow mode — whose LENGTH
    varies run to run (r5 traces: one run ramped 38k -> 160k in one window,
    another 0.5k -> 35k -> 159k over two); the FINAL window of a completed
    stream is drain-inflated (in-flight batches return without paying
    dispatch, r5: 297k vs 160k). The plateau is detected from the data:
    drop leading windows below 70% of the median of the last three, and the
    drain window of a completed stream. Everything stays recorded; only the
    statistic is steady-state — the reference's methodology is likewise
    steady-state items/sec (/root/reference/performance.md:106-114)."""
    n = len(passes)
    hi = n - 1 if (complete and n >= 4) else n
    lo = 0
    if hi >= 3:
        tail = sorted(passes[hi - 3:hi])[1]  # median of the last 3 settled
        while lo < hi - 2 and passes[lo] < 0.7 * tail:
            lo += 1
    idx = list(range(lo, hi))
    return idx, [passes[i] for i in idx]


def emit(
    qps: float,
    passes: list[float],
    final: bool,
    pass_details: list[dict] | None = None,
    settled_idx: list[int] | None = None,
    **extra,
) -> None:
    """Print the result JSON line AND checkpoint it to disk. Called after
    every measurement pass, not just at the end, so a mid-run kill (driver
    timeout, tunnel death) still leaves a parsed result on stdout and a
    same-commit checkpoint on disk (round-3 lesson: rc=124 left nothing).

    ``pass_details`` (one dict per window: GC deltas, host CPU seconds,
    tunnel RTT probe) is recorded in the checkpoint so pass-to-pass spread
    can be attributed to engine variance vs tunnel variance from the
    artifact alone."""
    rec = {
        "metric": METRIC,
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / REFERENCE_BASELINE_QPS, 3),
        "commit": _git_head(),
        **extra,
    }
    sv = [passes[i] for i in settled_idx] if settled_idx else passes
    if len(sv) >= 2:
        rec["spread"] = round(max(sv) / min(sv), 3)
    if len(passes) >= 2 and settled_idx:
        rec["spread_all_windows"] = round(max(passes) / min(passes), 3)
        rec["settled_windows"] = [i + 1 for i in settled_idx]
    if not final:
        rec["partial"] = f"{len(passes)} passes"
    print(json.dumps(rec), flush=True)
    try:
        os.makedirs(os.path.dirname(CHECKPOINT), exist_ok=True)
        with open(CHECKPOINT, "w", encoding="utf-8") as f:
            json.dump(
                {
                    **rec,
                    "passes": [round(p, 1) for p in passes],
                    "pass_details": pass_details or [],
                    "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "final": final,
                },
                f,
                indent=1,
            )
            f.write("\n")
    except OSError as e:
        log(f"checkpoint write failed: {e}")


def probe_rtt_ms(n: int = 3) -> float:
    """Tunnel round-trip probe: the min wall time of ``n`` tiny device adds,
    each fully synchronized. On a locally-attached chip this is ~0.1-0.5 ms;
    on the remote tunnel it directly measures the per-dispatch latency that
    every batch in a measurement window pays. Recorded per window so spread
    in q/s can be correlated with spread in RTT (engine vs tunnel)."""
    import jax
    import jax.numpy as jnp

    best = float("inf")
    x = jnp.ones((8,), jnp.float32)
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(x + 1.0)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


class WindowMeter:
    """Per-window host-side counters: GC collections/collected, host CPU
    seconds, RSS delta, and the tunnel RTT probe. All cheap (one gc.get_stats
    + getrusage per window; the RTT probe is 3 tiny device ops between
    windows, outside the timed region)."""

    def __init__(self):
        self._last = self._snap()

    @staticmethod
    def _snap() -> dict:
        import gc
        import resource

        stats = gc.get_stats()
        ru = resource.getrusage(resource.RUSAGE_SELF)
        return {
            "gc_collections": sum(s["collections"] for s in stats),
            "gc_collected": sum(s["collected"] for s in stats),
            "cpu_s": time.process_time(),
            "rss_kb": ru.ru_maxrss,
        }

    def window(self, wall_s: float) -> dict:
        cur = self._snap()
        last, self._last = self._last, cur
        return {
            "wall_s": round(wall_s, 3),
            "host_cpu_s": round(cur["cpu_s"] - last["cpu_s"], 3),
            "gc_collections": cur["gc_collections"] - last["gc_collections"],
            "gc_collected": cur["gc_collected"] - last["gc_collected"],
            "rss_delta_kb": cur["rss_kb"] - last["rss_kb"],
            "rtt_ms": round(probe_rtt_ms(), 3),
        }


def emit_outage_fallback(reason: str) -> None:
    """Backend unreachable: fail FAST with a parseable record instead of
    hanging into the driver timeout. If a completed checkpoint from this
    same commit exists, replay it (flagged from_checkpoint, so the record
    is honest about its provenance); otherwise emit an explicit error line."""
    try:
        with open(CHECKPOINT, encoding="utf-8") as f:
            ck = json.load(f)
    except (OSError, json.JSONDecodeError):
        ck = None
    if ck and ck.get("final"):
        rec = {
            "metric": ck["metric"],
            "value": ck["value"],
            "unit": ck["unit"],
            "vs_baseline": ck["vs_baseline"],
            "from_checkpoint": True,
            "measured_at": ck.get("measured_at"),
            "measured_commit": ck.get("commit"),
            "outage": reason,
        }
        if ck.get("commit") != _git_head():
            rec["stale_commit"] = True
        print(json.dumps(rec), flush=True)
        raise SystemExit(0)
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": 0,
                "unit": "queries/sec",
                "vs_baseline": 0,
                "error": reason,
            }
        ),
        flush=True,
    )
    raise SystemExit(1)


class Watchdog:
    """SIGALRM guard around device work: if the tunnel dies mid-run, a JAX
    call blocks forever — convert that into a timely exception so we can
    emit whatever passes completed instead of eating the driver timeout."""

    def __init__(self, seconds: int, what: str):
        self.seconds = seconds
        self.what = what

    def _fire(self, signum, frame):
        raise TimeoutError(f"watchdog: {self.what} exceeded {self.seconds}s")

    def __enter__(self):
        signal.signal(signal.SIGALRM, self._fire)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        signal.alarm(0)
        return False


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


def wait_for_backend(max_wait_s: float = 900.0) -> bool:
    """Wait (bounded) for the JAX backend, probed in a SUBPROCESS — an
    in-process init failure is sticky and a hung probe means the tunnel is
    down. Returns False once the window expires: the round-3 bench hung in
    warmup for the rest of the driver budget by proceeding into a wedged
    backend; failing fast with a parseable record is strictly better."""
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            rc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
                timeout=120,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1  # hung probe == backend down
        if rc == 0:
            return True
        waited = time.time() - t0
        if waited > max_wait_s:
            log(f"backend probe still failing after {waited:.0f}s; giving up")
            return False
        log(f"backend unavailable (probe {attempt}); retrying in 60s")
        time.sleep(60)


def main():
    probe_s = float(os.environ.get("ANALITICCL_BENCH_PROBE_S", "900"))
    if not wait_for_backend(probe_s):
        emit_outage_fallback("TPU backend unreachable after probe window")

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

    # exactness gate: device results vs the exact host oracle on 4096
    # queries — full result tuples (text, dist_score, freq_score, via) in
    # order, not just the variant-text set. Oracle results are computed once
    # and cached to disk keyed by (lexicon identity, params, query sample),
    # so the wide gate costs seconds after the first run.
    sample = queries[:4096]

    def tuples(res):
        return [
            (model.decoder[r.vocab_id].text, r.dist_score, r.freq_score, r.via)
            for r in res
        ]

    import hashlib
    import pickle

    lex_stat = os.stat(LEXICON)
    key = hashlib.sha256(
        repr(
            (
                LEXICON, lex_stat.st_size, lex_stat.st_mtime, ALPHABET,
                params, sample,
            )
        ).encode()
    ).hexdigest()[:16]
    cache_path = os.path.expanduser(f"~/.cache/analiticcl_oracle_{key}.pkl")
    oracle_res = None
    try:
        with open(cache_path, "rb") as f:
            oracle_res = pickle.load(f)
        log(f"oracle gate: loaded {len(oracle_res)} cached results")
    except (OSError, pickle.PickleError, EOFError):
        pass
    if oracle_res is None or len(oracle_res) != len(sample):
        t0 = time.time()
        model.set_backend("oracle")
        oracle_res = [tuples(model.find_variants(q, params)) for q in sample]
        model.set_backend("device")
        log(f"oracle gate: computed {len(sample)} results in {time.time()-t0:.0f}s")
        try:
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            with open(cache_path, "wb") as f:
                pickle.dump(oracle_res, f)
        except OSError:
            pass
    model.set_backend("device")
    try:
        with Watchdog(1200, "exactness-gate device run (incl. compile)"):
            device_res = [
                tuples(res) for res in model.find_variants_stream(sample, params)
            ]
    except TimeoutError as e:
        log(str(e))
        emit_outage_fallback("tunnel died during exactness gate")
    hit = sum(1 for o, d in zip(oracle_res, device_res) if o == d)
    log(
        f"exactness gate: {hit}/{len(sample)} queries bit-identical "
        "to oracle (scores, order, provenance)"
    )
    if hit < len(sample):
        shown = 0
        for q, o, d in zip(sample, oracle_res, device_res):
            if o != d:
                log(f"  MISMATCH {q!r}: oracle={o[:3]} device={d[:3]}")
                shown += 1
                if shown >= 10:
                    break
        raise SystemExit("device/oracle mismatch — benchmark aborted")

    # window-12 exactness gate: ratio thresholds push per-query edit
    # distances past 3, compiling the production W=12 DL bucket (banded ring
    # depth 15, margin clears, the d+s<=W+1 transposition prune) — this runs
    # it ON HARDWARE against the oracle, where CI's interpret-mode coverage
    # stops at W=5 (tests/test_pallas.py)
    params12 = SearchParameters(
        max_anagram_distance=DistanceThreshold.ratio_with_limit(0.5, 6),
        max_edit_distance=DistanceThreshold.ratio_with_limit(0.5, 12),
        max_matches=10,
        score_threshold=0.25,
    )
    long_words = [w for w in words if len(w) >= 9][:512]
    sample12 = [corrupt(corrupt(w, rng), rng) for w in long_words]
    key12 = hashlib.sha256(
        repr(
            (
                LEXICON, lex_stat.st_size, lex_stat.st_mtime, ALPHABET,
                params12, sample12, "w12",
            )
        ).encode()
    ).hexdigest()[:16]
    cache12 = os.path.expanduser(f"~/.cache/analiticcl_oracle_{key12}.pkl")
    oracle12 = None
    try:
        with open(cache12, "rb") as f:
            oracle12 = pickle.load(f)
    except (OSError, pickle.PickleError, EOFError):
        pass
    if oracle12 is None or len(oracle12) != len(sample12):
        t0 = time.time()
        model.set_backend("oracle")
        oracle12 = [tuples(model.find_variants(q, params12)) for q in sample12]
        model.set_backend("device")
        log(f"W12 oracle: computed {len(sample12)} in {time.time()-t0:.0f}s")
        try:
            with open(cache12, "wb") as f:
                pickle.dump(oracle12, f)
        except OSError:
            pass
    model.set_backend("device")
    try:
        with Watchdog(1200, "W12-gate device run (incl. compile)"):
            device12 = [
                tuples(res) for res in model.find_variants_stream(sample12, params12)
            ]
    except TimeoutError as e:
        log(str(e))
        emit_outage_fallback("tunnel died during W12 gate")
    hit12 = sum(1 for o, d in zip(oracle12, device12) if o == d)
    log(
        f"W12 gate: {hit12}/{len(sample12)} ratio-threshold queries "
        "bit-identical to oracle (window-12 DL bucket)"
    )
    if hit12 < len(sample12):
        for q, o, d in zip(sample12, oracle12, device12):
            if o != d:
                log(f"  W12 MISMATCH {q!r}: oracle={o[:3]} device={d[:3]}")
                break
        raise SystemExit("W12 device/oracle mismatch — benchmark aborted")

    # freeze the model heap: gen-2 GC rescans of the 120k-entry decoder cost
    # ~180 ms every ~5 batches otherwise (the round-2 bimodal stall)
    from analiticcl_tpu.utils.gc_tuning import freeze_model_heap

    frozen = freeze_model_heap()
    log(f"gc: froze {frozen} model-heap objects")

    # 8192-query device batches: the per-sync overhead (~25 ms on the remote
    # axon helper, measured by chained-call probes and the RTT meter) is the
    # dominant fixed cost, and the settled pair budget grows sublinearly
    # with B — measured medians 84.3k q/s at B=4096 vs 140.0k at B=8192
    # (same commit, back-to-back runs). ANALITICCL_BENCH_B overrides.
    B = int(os.environ.get("ANALITICCL_BENCH_B", "8192"))
    try:
        with Watchdog(900, "measurement warmup"):
            t0 = time.time()
            model.find_variants_batch(queries[:B], params)
            log(f"warmup (compile): {time.time() - t0:.1f}s")
            # keep warming until the pair budgets settle (escalation on
            # overflow AND de-escalation from a stale oversized hint both
            # recompile; that stall must land here, not in a measured window)
            pipe = model._device
            for i in range(2 + pipe.DEESC_N):
                before = (dict(pipe._P_by_B), dict(pipe._P2_by_B))
                t0 = time.time()
                model.find_variants_batch(queries[:B], params)
                dt = time.time() - t0
                if (dict(pipe._P_by_B), dict(pipe._P2_by_B)) != before:
                    log(
                        f"warm batch {i}: {dt:.3f}s (budgets re-settled: "
                        f"P={pipe._P_by_B} P2={pipe._P2_by_B})"
                    )
            log(f"warm batch: {dt:.3f}s")
    except TimeoutError as e:
        log(str(e))
        emit_outage_fallback("tunnel died during measurement warmup")

    # the TPU is remote-attached (~±20% tunnel variance): run ONE continuous
    # warm stream (the reference's steady-state items/sec methodology,
    # performance.md:106-114) and report the MEDIAN of five 16384-query
    # windows — robust to transient load without paying the pipeline-fill
    # latency five times. The running median is EMITTED AFTER EVERY WINDOW:
    # if the tunnel dies mid-run, stdout already holds a parseable record.
    # window count: the first 1-2 windows still carry pipeline fill + the
    # remote helper warming out of its post-compile slow mode (r5 traces ramp
    # 64k -> 106k over five windows); 9 windows put the median in the settled
    # region while keeping the run under ~10 s of measurement
    N_PASSES = int(os.environ.get("ANALITICCL_BENCH_PASSES", "9"))
    all_queries = queries * N_PASSES
    passes = []
    details: list[dict] = []
    meter = WindowMeter()
    t0 = time.time()
    last = t0
    done = 0
    try:
        stream = model.find_variants_stream(all_queries, params, batch_size=B)
        with Watchdog(600, "measurement window") as wd:
            for _res in stream:
                done += 1
                if done % len(queries) == 0:
                    signal.alarm(wd.seconds)  # re-arm per window
                    now = time.time()
                    elapsed = now - last
                    run_qps = len(queries) / elapsed
                    d = meter.window(elapsed)
                    log(
                        f"window {done // len(queries)}: {len(queries)} queries in "
                        f"{elapsed:.2f}s = {run_qps:.0f} q/s "
                        f"(host_cpu {d['host_cpu_s']:.2f}s, "
                        f"gc {d['gc_collections']}, rtt {d['rtt_ms']:.1f}ms)"
                    )
                    passes.append(run_qps)
                    details.append(d)
                    last = time.time()  # RTT probe time stays unmeasured
                    complete = len(passes) >= N_PASSES
                    idx, sv = settled_view(passes, complete)
                    ordered = sorted(sv)
                    emit(
                        ordered[len(ordered) // 2],
                        passes,
                        final=complete,
                        pass_details=details,
                        settled_idx=idx,
                    )
    except TimeoutError as e:
        log(str(e))
        if passes:
            idx, sv = settled_view(passes, complete=False)
            ordered = sorted(sv)
            emit(ordered[len(ordered) // 2], passes, final=False,
                 pass_details=details, settled_idx=idx,
                 outage="tunnel died mid-measurement")
            raise SystemExit(0)
        emit_outage_fallback("tunnel died before any measurement window")
    try:
        model._device.stats.report()
    except Exception:
        pass
    idx, sv = settled_view(passes, complete=True)
    ordered = sorted(sv)
    qps = ordered[len(ordered) // 2]
    spread = ordered[-1] / ordered[0]
    log(
        f"steady-state median of windows {idx[0] + 1}-{idx[-1] + 1} "
        f"({len(sv)} of {len(passes)}): {qps:.0f} q/s "
        f"(min {ordered[0]:.0f}, max {ordered[-1]:.0f}, "
        f"spread {spread:.2f}x; fill window {passes[0]:.0f}, "
        f"drain window {passes[-1]:.0f})"
    )
    if spread > 1.3:
        # attribute: engine-side signals are host CPU and GC; tunnel-side is
        # RTT. Report which axis co-varies with the slow windows (settled
        # windows only — fill/drain are already attributed by construction).
        slow = min(idx, key=lambda i: passes[i])
        fast = max(idx, key=lambda i: passes[i])
        log(
            f"spread>1.3x attribution: slow window {slow + 1} "
            f"(host_cpu {details[slow]['host_cpu_s']:.2f}s, "
            f"gc {details[slow]['gc_collections']}, "
            f"rtt {details[slow]['rtt_ms']:.1f}ms) vs fast window {fast + 1} "
            f"(host_cpu {details[fast]['host_cpu_s']:.2f}s, "
            f"gc {details[fast]['gc_collections']}, "
            f"rtt {details[fast]['rtt_ms']:.1f}ms)"
        )


if __name__ == "__main__":
    main()
