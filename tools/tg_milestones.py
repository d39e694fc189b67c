"""Extract milestone rows from a compare_fluid_tg JSONL log.

Usage: python tools/tg_milestones.py /tmp/run.log [t1 t2 ...]
Prints t / rel_l2 / amp / sec for the requested timesteps (default
0 10 20 30 40 50 60 70 80 90 100), plus max-over-horizon, the last step
at which rel_l2 <= 1e-3 / 1e-2, and the median sec/step.
"""

import json
import statistics
import sys


def main():
    path = sys.argv[1]
    wanted = ([int(x) for x in sys.argv[2:]]
              or [0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100])
    rows = []
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        rec = json.loads(line)
        if "t" in rec and "rel_l2" in rec:
            rows.append(rec)
    by_t = {r["t"]: r for r in rows}
    for t in wanted:
        if t in by_t:
            r = by_t[t]
            print(f"t={t:3d}  rel_l2={r['rel_l2']:.3e}  "
                  f"amp={r.get('amp', float('nan')):.6f}  sec={r['sec']}")
    if rows:
        mx = max(rows, key=lambda r: r["rel_l2"])
        print(f"max rel_l2 {mx['rel_l2']:.3e} at t={mx['t']}")
        for bar in (1e-3, 3e-3, 1e-2):
            ok = [r["t"] for r in rows if r["rel_l2"] <= bar]
            run = -1
            for t in sorted(by_t):
                if by_t[t]["rel_l2"] <= bar and t == run + 1:
                    run = t
                else:
                    break
            print(f"last t with rel_l2<={bar:g}: "
                  f"{max(ok) if ok else None} (contiguous from 0: {run})")
        print(f"median sec/step {statistics.median(r['sec'] for r in rows)}")


if __name__ == "__main__":
    main()
