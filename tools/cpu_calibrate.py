"""Pure-CPU scaling calibration (no Spark): fixed total work split across
N processes. Measures the HOST's parallel-scaling ceiling so the software
scaling number (tools/scaling_bench.py) can be read against what the
hardware itself delivers (turbo decay + SMT make local[N] ceilings < N/M).

Usage: python tools/cpu_calibrate.py <workers> [total_units] [trials]
"""
import json
import multiprocessing as mp
import sys
import time


def burn(units: int) -> int:
    acc = 0
    for u in range(units):
        x = 1469598103934665603
        for i in range(200_000):
            x = (x ^ i) * 1099511628211 % (1 << 64)
        acc ^= x
    return acc


def main() -> None:
    workers = int(sys.argv[1])
    total = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    per = [total // workers + (1 if i < total % workers else 0) for i in range(workers)]
    walls = []
    for _ in range(trials):
        t0 = time.monotonic()
        with mp.Pool(workers) as p:
            p.map(burn, per)
        walls.append(round(time.monotonic() - t0, 2))
    print(json.dumps({"workers": workers, "total_units": total,
                      "walls": walls, "best": min(walls)}))


if __name__ == "__main__":
    main()
