#!/usr/bin/env python
"""Per-workload N-vs-4N envelope of THIS box: what scaling efficiency
each RESOURCE CLASS can demonstrate between local[N]-like and
local[4N]-like process counts, at FIXED total work.

Three workloads, one per resource class the index build mixes:

  alu     — cache-resident integer loop: pure core scaling (the envelope
            bench_scaling.py already records as cpu_microbench_eff)
  stream  — numpy array copy: saturates the single socket's shared
            memory bandwidth (adding cores adds no bandwidth)
  pystr   — CPython string/dict allocation churn (split/join/Counter):
            the extract/analyze stage's actual workload shape —
            allocator + memory-bus bound, not ALU bound

eff = (t_N / t_4N) / 4 at fixed total work; 1.0 = perfect.

Purpose (BENCH/BASELINE.md round-4 scaling section): the whole-build 2v8
pair measures the ENGINE TIMES THE BOX. If the build's measured
efficiency matches the stream/pystr envelope while the alu envelope sits
near 1.0, the non-scaling component is the box's shared memory
subsystem — which a real multi-executor cluster does not share (every
executor brings its own socket, bus and disk) — and not serialization in
the engine's plan. Prints one JSON line; writes BENCH/membw_envelope.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

LEVELS = tuple(int(x) for x in
               os.environ.get("MEMBW_LEVELS", "2,8").split(","))
TASKS_TOTAL = int(os.environ.get("MEMBW_TASKS", "16"))
REPS = int(os.environ.get("MEMBW_REPS", "3"))


def _alu(_):
    x = 0
    for i in range(12_000_000):
        x += i * i
    return x


def _stream(_):
    import numpy as np

    a = np.ones(48 * 1024 * 1024 // 8)  # 48 MB of float64 — far past LLC
    s = 0.0
    for _ in range(60):
        b = a.copy()        # stream read + write
        s += float(b[0])
    return s


def _pystr(_):
    from collections import Counter

    words = [f"w{i % 997:04d}" for i in range(120_000)]
    s = " ".join(words)
    total = 0
    for _ in range(12):
        toks = s.split(" ")
        c = Counter(toks)
        total += len(c)
    return total


_WORK = {"alu": _alu, "stream": _stream, "pystr": _pystr}


def _run(fn, procs: int) -> float:
    with mp.Pool(procs) as p:
        t0 = time.time()
        p.map(fn, range(TASKS_TOTAL))
        return time.time() - t0


def main() -> None:
    lo, hi = LEVELS
    result: dict = {"metric": "per-workload scaling envelope (fixed work)",
                    "levels": list(LEVELS), "tasks_total": TASKS_TOTAL,
                    "load_avg_at_start": os.getloadavg()[1],
                    "workloads": {}}
    for name, fn in _WORK.items():
        _run(fn, lo)  # warm pool-spawn + allocator
        t_lo = [_run(fn, lo) for _ in range(REPS)]
        t_hi = [_run(fn, hi) for _ in range(REPS)]
        m_lo, m_hi = statistics.median(t_lo), statistics.median(t_hi)
        eff = (m_lo / m_hi) / (hi / lo)
        result["workloads"][name] = {
            "t_lo_sec": [round(t, 2) for t in t_lo],
            "t_hi_sec": [round(t, 2) for t in t_hi],
            "median_lo": round(m_lo, 2), "median_hi": round(m_hi, 2),
            "efficiency": round(eff, 3),
        }
        print(f"{name}: {m_lo:.1f}s @ {lo}p vs {m_hi:.1f}s @ {hi}p "
              f"-> eff {eff:.3f}", file=sys.stderr, flush=True)
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH", "membw_envelope.json"), "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
