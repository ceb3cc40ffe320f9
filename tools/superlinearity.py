"""Superlinearity table: compare two bench.py JSON lines (a small-SF and
a large-SF run) and print per-query wall-clock growth vs the data-growth
factor.

A query that scales linearly at fixed parallelism grows ~= factor; on
this box the small-SF runs leave most of local[32] idle, so healthy
growth is usually WELL below the factor (the added data soaks up idle
cores) — flagged growth is growth above the factor, which at 10x means
the operator's work grows faster than its input (quadratic pair
generation, per-group sorts crossing a spill threshold, driver-side
collects growing with the data).

Usage: python tools/superlinearity.py small.json big.json [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import math


def load(path: str) -> dict:
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--factor", type=float, default=10.0)
    args = ap.parse_args()
    s, b = load(args.small), load(args.big)
    sq, bq = s["queries"], b["queries"]
    rows = []
    for name in sq:
        if name not in bq:
            continue
        ratio = bq[name] / sq[name] if sq[name] > 0 else math.inf
        rows.append((name, sq[name], bq[name], ratio))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | sf{s.get('sf')} s | sf{b.get('sf')} s | growth | vs {args.factor:g}x |")
    print("|---|---|---|---|---|")
    for name, a, c, r in rows:
        flag = "**SUPERLINEAR**" if r > args.factor else ("sublinear" if r < args.factor / 2 else "~linear")
        print(f"| {name} | {a:.2f} | {c:.2f} | {r:.1f}x | {flag} |")
    tot_s = sum(sq[n] for n, *_ in [(r[0],) for r in rows])
    tot_b = sum(bq[r[0]] for r in rows)
    print(f"\ntotal: {tot_s:.1f}s -> {tot_b:.1f}s ({tot_b / tot_s:.1f}x at {args.factor:g}x data)")
    sup = [r[0] for r in rows if r[3] > args.factor]
    print("superlinear:", ", ".join(sup) if sup else "none")


if __name__ == "__main__":
    main()
