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


def _triad_worker(n: int, reps: int, barrier, q) -> None:
    import numpy as np

    a = np.zeros(n)
    b = np.full(n, 1.5)
    c = np.full(n, 0.5)
    barrier.wait()  # all workers allocated and page-faulted — start together
    t0 = time.time()
    for _ in range(reps):
        # triad a = b + 3*c as two in-place passes:
        #   pass 1 reads c, writes a (16 B/elem); pass 2 reads a+b, writes a
        #   (24 B/elem) → 40 bytes of DRAM traffic per element per rep
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)
    q.put(time.time() - t0)


def triad_gbps(workers: int = 1, n: int = 16_000_000, reps: int = 3) -> float:
    """STREAM-style triad aggregate memory bandwidth in GB/s across *workers*
    concurrent processes (128 MB arrays — far past any LLC, so this measures
    DRAM, not cache). The single-core md5 canary measures cycle speed; this
    measures the OTHER shared resource — socket memory bandwidth. The scaling
    knee past ~8 cores is a bandwidth roofline claim: if triad_gbps(8) ≈
    triad_gbps(2) in aggregate, the socket is saturated and per-core
    throughput must fall no matter how clean the Spark plan is. Record both
    a 1-worker and an N-worker value next to every scaling leg."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(workers + 1)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_triad_worker, args=(n, reps, barrier, q))
        for _ in range(workers)
    ]
    for p in procs:
        p.start()
    barrier.wait()
    times = [q.get() for _ in procs]
    for p in procs:
        p.join()
    total_bytes = workers * reps * n * 8 * 5  # 40 B/elem/rep (see worker)
    return round(total_bytes / max(times) / 1e9, 1)


if __name__ == "__main__":
    import sys

    if "--triad" in sys.argv:
        w = int(sys.argv[sys.argv.index("--triad") + 1])
        print(triad_gbps(w))
    else:
        print(canary_sec())
