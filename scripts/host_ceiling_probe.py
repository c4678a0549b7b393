#!/usr/bin/env python
"""Pure-CPU host scaling ceiling — context for BENCH_SCALING*.json.

Measures what THIS box can sustain with zero Spark involvement: a
multiprocessing pool burning identical arithmetic work units at several
process counts. Any Spark job's scaling efficiency is bounded above by
these numbers — on a 16-physical-core/32-SMT-thread host the 8->32 pair
cannot reach the north rule's 0.8 no matter how parallel the plan is,
while 2->8 (same 4x ratio, all physical cores) can.

Writes BENCH_HOST_CEILING.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

WORK = 20_000_000
TASKS_PER_PROC = 4


def burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def timed(procs: int) -> float:
    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        p.map(burn, [WORK] * procs * TASKS_PER_PROC)
    return time.perf_counter() - t0


REPEATS = 3  # best-of: single runs vary +-20% on this host


def main() -> None:
    levels = [1, 2, 8, 32]
    rates = {}
    for procs in levels:
        t = min(timed(procs) for _ in range(REPEATS))
        rates[procs] = round(procs * TASKS_PER_PROC / t, 3)
        print(f"{procs:>3} procs: best {t:6.2f}s  units/s={rates[procs]}")
    out = {
        "work_units_per_sec": {str(k): v for k, v in rates.items()},
        "efficiency_2_to_8": round((rates[8] / rates[2]) / 4, 3),
        "efficiency_8_to_32": round((rates[32] / rates[8]) / 4, 3),
        "note": (
            "pure-CPU multiprocessing, no Spark. Upper bound for any "
            "Spark job's scaling efficiency between the same core counts; "
            "8->32 is SMT-limited on this host."
        ),
    }
    with open("BENCH_HOST_CEILING.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
