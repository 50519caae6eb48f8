"""Same-window CPU canary for benchmark runs.

This sandbox is a shared-host VM whose effective per-core speed drifts by
~±60% over minutes (neighbor pressure shows up as slower cycles and bursts of
hypervisor steal, not as load in the guest). Absolute wall-clock numbers are
therefore only comparable when taken in the same window, and every recorded
benchmark should carry the canary measured next to it.

The canary is a fixed single-core CPU-bound loop (2M chained md5 digests,
~1.2 s on this box in a quiet window). Report `canary_sec` with any benchmark:
a run with canary 2.0 is not comparable to one with canary 1.2.

Usage:
    from canary import canary_sec
    c0 = canary_sec()   # before
    ... run benchmark ...
    c1 = canary_sec()   # after
"""

from __future__ import annotations

import hashlib
import time


def canary_sec(n: int = 2_000_000) -> float:
    t0 = time.time()
    h = b"x"
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return round(time.time() - t0, 3)


if __name__ == "__main__":
    print(canary_sec())
