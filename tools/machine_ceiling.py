"""Machine-ceiling calibration for the N→4N scaling evidence.

Measures how much aggregate compute THIS host actually provides when
going from 8 to 32 busy processes, with **plain Python processes — no
Spark, no JVM** — so the number is a property of the machine, not the
engine. The scaling efficiency reported in BENCH/BASELINE.md is
normalized against this ceiling: a burstable/oversubscribed VM that
only delivers ~0.65 of linear 8→32 caps ANY engine at that figure.

Two workload shapes, both best-of-k:
* ``cpu``   — pure integer loop (worst-case ceiling)
* ``alloc`` — string/alloc-heavy loop (closer to extraction's profile)

Usage: python tools/machine_ceiling.py [k] → JSON on stdout.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

CPU_CHILD = (
    "import time,sys; t0=time.monotonic();\n"
    "x=0\n"
    "for i in range(30_000_000): x+=i\n"
    "print(time.monotonic()-t0)"
)

ALLOC_CHILD = (
    "import time,sys; t0=time.monotonic();\n"
    "s=''\n"
    "for i in range(700_000):\n"
    "    s = ('block %d ' % i) * 8\n"
    "    s = s.upper().split()\n"
    "print(time.monotonic()-t0)"
)


def run_group(n_procs: int, child: str) -> float:
    """Aggregate work-units/sec for n_procs concurrent processes
    (each does one fixed work unit; throughput = n / slowest)."""
    procs = [
        subprocess.Popen([sys.executable, "-c", child], stdout=subprocess.PIPE, text=True)
        for _ in range(n_procs)
    ]
    t0 = time.monotonic()
    for p in procs:
        p.wait()
    wall = time.monotonic() - t0
    return n_procs / wall


def efficiency(child: str, k: int) -> dict:
    t8 = max(run_group(8, child) for _ in range(k))
    t32 = max(run_group(32, child) for _ in range(k))
    return {
        "units_per_sec_8": round(t8, 3),
        "units_per_sec_32": round(t32, 3),
        "efficiency_8_to_32": round(t32 / (4 * t8), 3),
    }


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = {
        "cpu_burn": efficiency(CPU_CHILD, k),
        "alloc_burn": efficiency(ALLOC_CHILD, k),
        "k": k,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
