#!/usr/bin/env python3
"""Compute the next driver-window rotation from recorded evidence.

Folds every CORRECTNESS_r*.json into a latest-green-round map, prints
the freshness histogram, and emits the oldest-first fill list for the
next round's `registry._PRIORITY` (the driver checks only the FIRST 50
registry entries per round, so rotation is what keeps every query's
evidence fresh). New registrations and code-touched queries are not
derivable from evidence files — list them by hand at the head of the
window; they displace the youngest fills one-for-one (this tool prints
the full fill queue so the displacement is a cut, not a recompute).

Usage: python tools/window_plan.py [--window 50] [--assume-next N]

--assume-next N: also simulate the histogram AFTER the currently
  configured _PRIORITY runs as round N (sanity check that the plan in
  PLANS.md matches what the fold will actually produce).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fold() -> tuple[dict[str, int], dict[int, list[str]]]:
    """latest green round per query + per-round row order."""
    latest: dict[str, int] = {}
    order: dict[int, list[str]] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(p.rsplit("_r", 1)[1].split(".")[0])
        names = list(json.load(open(p)))
        order[r] = names
        for n in names:
            latest[n] = r
    return latest, order


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--assume-next", type=int, default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from parallel_map_reduce_spark import registry

    qs = list(entrymod.queries())
    latest, order = fold()

    orphans = sorted(set(latest) - set(qs))
    if orphans:
        print(f"!! CORRECTNESS rows for unregistered names: {orphans}")

    if args.assume_next is not None:
        for n in registry._PRIORITY:
            latest[n] = args.assume_next
        order[args.assume_next] = list(registry._PRIORITY)

    never = [n for n in qs if n not in latest]

    hist = collections.Counter(latest[n] for n in qs if n in latest)
    print("latest-green histogram:", dict(sorted(hist.items())))
    if never:
        print(f"never-checked ({len(never)}; MUST head the next window):")
        for n in never:
            print(f"  {n}")

    print(f"\nfill queue (oldest round first, that round's row order);")
    print("cut to window size after placing new + code-touched heads:")
    emitted = 0
    for r in sorted(hist):
        rows = [n for n in order.get(r, []) if latest.get(n) == r]
        print(f"# round {r} ({len(rows)} rows)")
        for n in rows:
            emitted += 1
            marker = " <-- window boundary" if emitted == args.window else ""
            print(f"  {n}{marker}")
            if emitted >= args.window:
                break
        if emitted >= args.window:
            break
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
