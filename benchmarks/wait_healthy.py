"""Block until the host leaves a throttled phase (see BENCH.md): pure-Python
burn < threshold AND memcpy bandwidth above floor, twice in a row.

Usage: python benchmarks/wait_healthy.py [max_wait_seconds]
Exits 0 when healthy, 1 on timeout (prints the last probes either way).
"""

import sys
import time


def burn() -> float:
    t = time.time()
    x = 0
    for i in range(3_000_000):
        x += i
    return round(time.time() - t, 3)


def membw() -> float:
    import numpy as np

    a = np.ones(8 * 1024 * 1024 // 8)
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        n = 0
        while time.time() - t0 < 0.1:
            _ = a.copy()
            n += 1
        best = max(best, n * 8 / 1024 / (time.time() - t0))
    return round(best, 2)


def main():
    max_wait = float(sys.argv[1]) if len(sys.argv) > 1 else 1800
    deadline = time.time() + max_wait
    streak = 0
    while time.time() < deadline:
        b, m = burn(), membw()
        if b < 0.20 and m > 5.0:
            streak += 1
            if streak >= 2:
                print(f"healthy: burn={b} membw={m}")
                return 0
        else:
            streak = 0
        time.sleep(5)
    print(f"TIMEOUT still throttled: burn={burn()} membw={membw()}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
