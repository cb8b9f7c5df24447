"""Compare two bench result files (BENCH_FULL_local.json shape).

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold_ratio]

Prints per-query regressions/improvements beyond the ratio threshold
(default 1.5x) plus queries added/removed. Remember the noise floor:
single-query times swing 3-10x in this container — only flag a
regression after re-measuring min-of-3 in a fresh session.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    both = sorted(set(old) & set(new))
    regress = [(n, old[n], new[n]) for n in both
               if new[n] > max(old[n], 0.05) * thr and new[n] - old[n] > 0.3]
    improve = [(n, old[n], new[n]) for n in both
               if old[n] > max(new[n], 0.05) * thr and old[n] - new[n] > 0.3]
    print(f"total: {sum(old.values()):.1f}s -> {sum(new.values()):.1f}s "
          f"({len(old)} -> {len(new)} queries)")
    for label, rows in (("SLOWER", regress), ("faster", improve)):
        for n, o, v in sorted(rows, key=lambda r: r[1] - r[2]):
            print(f"{label}  {n}: {o:.2f}s -> {v:.2f}s")
    for n in sorted(set(new) - set(old)):
        print(f"added   {n}: {new[n]:.2f}s")
    for n in sorted(set(old) - set(new)):
        print(f"removed {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
