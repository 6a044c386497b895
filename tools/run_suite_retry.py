"""Outage-proof benchmark-suite runner (the tracked successor of the
round-3 /tmp/run_suite_retry.sh).

Runs every scenario of benchmarks/suite.py as its OWN bounded subprocess,
appending stdout JSON lines to a log file as each finishes — so a tunnel
outage mid-sweep loses at most one scenario, never the round's record
(round-3 lesson: BENCH_r03 was rc=124 with nothing parsed).

    python tools/run_suite_retry.py [--round N] [--log PATH] [scenario ...]

Behavior:
  - probes the JAX backend in a subprocess before each scenario (a hung
    probe == tunnel down); sleeps and retries while it is down
  - skips scenarios already recorded in the log (reruns append, last wins)
  - per-scenario wall-clock bound via `timeout`; failed/timed-out scenarios
    are retried up to --attempts times, after the rest have had their turn
  - touch benchmarks/STOP_SUITE to make it exit cleanly before the next
    scenario (the chip is single-lease: this runner must be dead before
    any other TPU process, e.g. the driver's bench.py, starts)
  - on completion, rebuilds benchmarks/RESULTS_r{N}.json via
    tools/record_results.py
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STOP_FILE = os.path.join(REPO, "benchmarks", "STOP_SUITE")

ALL_SCENARIOS = [
    # cheap + headline first so an early outage still leaves the core record
    "bench",  # pseudo-scenario: bench.py itself (writes its own checkpoint)
    "query_eng",
    "query_nld_freq",
    "search_text",
    "learn",
    "query_ratio",
    "confusables_errors",
    "search_lm",
    "sharded_query",
    "micro",
    "build_1m",
    "sharded_1m",
    "learn_1m",
]

# generous per-scenario wall bounds (1-core host; 1M scenarios synthesize
# the lexicon on first run and build a 1M-row index)
TIMEOUT_S = {
    "bench": 3600,
    "build_1m": 3600,
    "sharded_1m": 3600,
    "learn_1m": 3600,
    "micro": 2400,
}
DEFAULT_TIMEOUT_S = 1800


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, file=sys.stderr, flush=True)


def backend_up(timeout_s: int = 120) -> bool:
    try:
        rc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            timeout=timeout_s,
            cwd=REPO,
        ).returncode
    except subprocess.TimeoutExpired:
        return False
    return rc == 0


def recorded_scenarios(log_path: str) -> set[str]:
    done = set()
    try:
        with open(log_path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(obj, dict) and "scenario" in obj:
                    done.add(obj["scenario"])
    except OSError:
        pass
    return done


def run_scenario(name: str, log_path: str) -> bool:
    bound = TIMEOUT_S.get(name, DEFAULT_TIMEOUT_S)
    if name == "bench":
        cmd = [sys.executable, "bench.py"]
    else:
        cmd = [sys.executable, os.path.join("benchmarks", "suite.py"), name]
    log(f"running {name} (bound {bound}s)")
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            timeout=bound,
            cwd=REPO,
            env={**os.environ, "ANALITICCL_BENCH_PROBE_S": "120"},
        )
    except subprocess.TimeoutExpired as e:
        log(f"{name}: TIMED OUT after {bound}s")
        tail = (e.stderr or b"")
        if isinstance(tail, bytes):
            tail = tail.decode("utf-8", "replace")
        for line in tail.splitlines()[-5:]:
            log(f"  stderr: {line}")
        return False
    dt = time.time() - t0
    for line in proc.stderr.splitlines()[-6:]:
        log(f"  {name} stderr: {line}")
    got = False
    with open(log_path, "a", encoding="utf-8") as f:
        for line in proc.stdout.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            if name == "bench":
                # bench.py emits {"metric": ...}; tag it so the recorded-
                # scenario check (and record_results.py) can see it. Partial
                # or outage-fallback lines don't count as done.
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "partial" in obj or "error" in obj or "outage" in obj:
                    continue
                obj["scenario"] = "bench"
                line = json.dumps(obj)
            f.write(line + "\n")
            got = True
        f.flush()
        os.fsync(f.fileno())
    log(f"{name}: rc={proc.returncode} in {dt:.0f}s, recorded={got}")
    return got and proc.returncode == 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--log", default=None)
    ap.add_argument("--attempts", type=int, default=4)
    ap.add_argument("--force", action="store_true",
                    help="rerun scenarios already in the log")
    ap.add_argument("--deadline-s", type=float, default=None,
                    help="hard wall-clock budget; no scenario STARTS if it "
                         "could not finish inside it (the chip is "
                         "single-lease — this runner must never outlive "
                         "its window into the driver's bench slot)")
    ap.add_argument("scenarios", nargs="*", default=None)
    args = ap.parse_args()
    t_start = time.time()

    log_path = args.log or os.path.join(
        REPO, "benchmarks", f"r{args.round:02d}_suite.log"
    )
    wanted = args.scenarios or ALL_SCENARIOS
    attempts = {s: 0 for s in wanted}

    while True:
        if os.path.exists(STOP_FILE):
            log("STOP_SUITE present — exiting")
            break
        done = set() if args.force else recorded_scenarios(log_path)
        pending = [
            s for s in wanted
            if s not in done and attempts[s] < args.attempts
        ]
        if not pending:
            break
        name = pending[0]
        if args.deadline_s is not None:
            remaining = args.deadline_s - (time.time() - t_start)
            if remaining < TIMEOUT_S.get(name, DEFAULT_TIMEOUT_S) + 180:
                log(f"deadline: {remaining:.0f}s left, not starting {name}")
                break
        if not backend_up():
            log(f"backend down ({len(pending)} scenarios pending); sleeping 120s")
            time.sleep(120)
            continue
        attempts[name] += 1
        run_scenario(name, log_path)

    done = recorded_scenarios(log_path)
    missing = [s for s in wanted if s not in done]
    log(f"recorded {len(done & set(wanted))}/{len(wanted)} scenarios"
        + (f"; missing: {missing}" if missing else ""))
    if done:
        subprocess.run(
            [sys.executable, os.path.join("tools", "record_results.py"),
             str(args.round), log_path],
            cwd=REPO,
        )
    return 0 if not missing else 1


if __name__ == "__main__":
    sys.exit(main())
