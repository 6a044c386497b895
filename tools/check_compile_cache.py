#!/usr/bin/env python3
"""Cross-process compilation-cache probe for the axon remote backend.

Round-4 carried the claim that the persistent XLA compilation cache is
unreliable over the tunnel (cache key contaminated by tunnel identity).
This tool measures it: compile a shape-distinctive jitted function, then
re-run the SAME script in a fresh subprocess and compare compile times.
A second-process compile near the first's duration means MISS.

    python tools/check_compile_cache.py            # parent: runs both
    python tools/check_compile_cache.py --child N  # internal
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_child(tag: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", tag],
        capture_output=True, text=True, timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"child {tag} produced no record: {out.stderr[-500:]}")


def child(tag: str) -> None:
    import numpy as np

    import analiticcl_tpu.ops.pipeline  # sets jax_compilation_cache_dir
    import jax
    import jax.numpy as jnp

    # a shape unlikely to collide with production programs, but the same
    # every run of this tool: steady-state = cache hit
    x = jax.device_put(np.ones((517, 263), np.float32))

    @jax.jit
    def f(a):
        return jnp.tanh(a @ a.T).sum() + jnp.cumsum(a, axis=1)[3, 7]

    t0 = time.time()
    jax.block_until_ready(f(x))
    dt = time.time() - t0
    print(json.dumps({"tag": tag, "first_call_s": round(dt, 3),
                      "backend": jax.default_backend()}))


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return 0
    a = run_child("first")
    b = run_child("second")
    hit = b["first_call_s"] < max(0.5, 0.3 * a["first_call_s"])
    print(json.dumps({
        "backend": a["backend"],
        "first_process_compile_s": a["first_call_s"],
        "second_process_compile_s": b["first_call_s"],
        "cross_process_cache_hit": hit,
    }))
    return 0


if __name__ == "__main__":
    main()
