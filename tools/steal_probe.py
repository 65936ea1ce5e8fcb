"""Host-contention probe used for the BASELINE.md bench methodology.

This shared host shows CPU-steal bursts that degrade identical code 2-20x
for tens of seconds to minutes at a time (BASELINE.md documents runs of the
same replay measuring 9.8 s and 30+ s within the hour). Before trusting a
wall-clock number, run this probe: it times three 2000x2000 float64 GEMMs
on one core. Quiet host: ~1.0-1.5 s. Stolen host: 2.6-25 s observed.

Usage: python tools/steal_probe.py [n_repeats]
"""

import sys
import time

import numpy as np


def probe() -> float:
    a = np.random.rand(2000, 2000)
    t = time.time()
    for _ in range(3):
        a @ a
    return time.time() - t


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    for _ in range(n):
        print(f"{probe():.2f}s  (quiet ~1.0-1.5s)")
