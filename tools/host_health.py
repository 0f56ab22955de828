"""Quick host-contention probe: steal%% over 2 s + a fixed
single-thread CPU microbenchmark.  Run before/after a measurement to
know whether to trust it (r6's driver bench had a ~6-minute
contention window that contaminated 9 queries; VERDICT r6 #1)."""

from __future__ import annotations

import time


def cpu_delta(seconds: float = 2.0) -> dict:
    with open("/proc/stat") as f:
        a = [int(x) for x in f.readline().split()[1:]]
    time.sleep(seconds)
    with open("/proc/stat") as f:
        b = [int(x) for x in f.readline().split()[1:]]
    d = [y - x for x, y in zip(a, b)]
    names = ["user", "nice", "system", "idle", "iowait", "irq",
             "softirq", "steal", "guest", "gnice"]
    out = dict(zip(names, d))
    total = sum(d) or 1
    out["steal_pct"] = round(100.0 * out.get("steal", 0) / total, 2)
    return out


def microbench() -> float:
    """Fixed pure-python workload; ~0.25 s on an uncontended core."""
    t0 = time.time()
    acc = 0
    for i in range(4_000_000):
        acc += i * i
    return round(time.time() - t0, 3)


if __name__ == "__main__":
    import json

    with open("/proc/loadavg") as f:
        load = f.read().split()[:3]
    print(json.dumps({
        "loadavg": load,
        "microbench_s": microbench(),
        "cpu": cpu_delta(),
    }))
