"""Assemble benchmarks/RESULTS_r{N}.json from suite log files.

Usage: python tools/record_results.py 3 /tmp/suite_r03_a.log [/tmp/suite_r03_b.log ...]

Each log line that parses as a JSON object with a "scenario" key is
collected (later duplicates of a scenario replace earlier ones, so reruns
in the same log win).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analiticcl_tpu.utils.provenance import stamp  # noqa: E402


def main() -> int:
    rnd = int(sys.argv[1])
    scenarios = {}
    for path in sys.argv[2:]:
        try:
            with open(path, encoding="utf-8") as f:
                lines = f.read().splitlines()
        except OSError as e:
            print(f"warning: {path}: {e}", file=sys.stderr)
            continue
        for line in lines:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict) and "scenario" in obj:
                scenarios[obj["scenario"]] = obj
    out = stamp({
        "round": rnd,
        "device": "1x TPU v5e (remote-attached, axon)",
        "scenarios": list(scenarios.values()),
    })
    # per-scenario commit hashes live in the scenario lines themselves (the
    # suite stamps each line at emission); the top-level stamp records when
    # and at what HEAD this file was assembled
    def _same_commit(a, b):
        # hashes may be abbreviated to different lengths; compare prefixes
        if not a or not b:
            return a == b
        return a.startswith(b) or b.startswith(a)

    stale = sorted(
        {s["scenario"] for s in scenarios.values()
         if s.get("commit") is not None
         and not _same_commit(s["commit"], out["commit"])}
    )
    if stale:
        out["scenarios_not_at_head"] = stale
    path = f"benchmarks/RESULTS_r{rnd:02d}.json"
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path} with {len(scenarios)} scenarios")
    return 0


if __name__ == "__main__":
    sys.exit(main())
