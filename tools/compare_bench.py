#!/usr/bin/env python3
"""Compare bench rounds: per-query table + regression flags.

Usage:
    python tools/compare_bench.py BENCH_r01.json BENCH_r02.json [...]
    python tools/compare_bench.py BENCH_r01.json /tmp/bench_local.json

Accepts both formats: the driver's wrapper ({"n", "rc", "cpus", "sf",
"tail"} with the bench's JSON line buried in `tail` among \\r progress
junk) and bench.py's raw single-line output. Queries are compared against
the FIRST file given. Flag thresholds follow the timing protocol: rows
measured median-of-3 in the LATEST file (bench.py's MEDIAN3 tier,
recorded in `median3_rows` since headline_timing=median3) flag at
>1.3x — the median is robust to one-sided load spikes; best-of-N rows
flag only at >2.2x, the measured noise-probe spread on this shared host
(a smaller single-shot move is indistinguishable from load).
"""

from __future__ import annotations

import json
import re
import sys

REGRESSION_RATIO = 1.3
NOISE_RATIO = 2.2  # measured noise_probe spread (BENCH_r08) on best-of-N rows


def load_bench(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "tail" in d:  # driver wrapper: extract the JSON line from raw output
        m = re.search(r'\{"metric".*\}', d["tail"])
        if not m:
            raise ValueError(f"{path}: no bench JSON line inside 'tail'")
        d = json.loads(m.group(0))
    return d


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    rounds = [(p, load_bench(p)) for p in argv]
    base_name, base = rounds[0]
    names = [p for p, _ in rounds]
    qnames = sorted(
        set().union(*[set(d["queries"]) for _, d in rounds]),
        key=lambda q: -base["queries"].get(q, 0.0),
    )
    header = f"{'query':40s}" + "".join(f"{n[-12:]:>13s}" for n in names)
    print(header + f"{'last/base':>10s}")
    # The budgeted stdout line (the driver-wrapper 'tail' format)
    # carries median3_rows as its COUNT, not the name list; only a
    # real list selects the tight threshold — otherwise every row
    # falls back to the NOISE_RATIO band (read BENCH_FULL.json for
    # the names when they matter).
    m3 = rounds[-1][1].get("median3_rows")
    median3 = set(m3) if isinstance(m3, list) else set()
    flagged = []
    for q in qnames:
        cells = ""
        for _, d in rounds:
            v = d["queries"].get(q)
            cells += f"{v:13.3f}" if v is not None else f"{'-':>13s}"
        b, last = base["queries"].get(q), rounds[-1][1]["queries"].get(q)
        if b is not None and last is not None and b > 0:
            ratio = last / b
            # Median-of-3 rows are load-robust → the tight threshold;
            # best-of-N rows only flag above the measured noise band.
            limit = REGRESSION_RATIO if q in median3 else NOISE_RATIO
            mark = " m3" if q in median3 else ""
            flag = f"  <-- REGR(>{limit}x)" if ratio > limit else ""
            if flag:
                flagged.append(q)
            print(f"{q:40s}{cells}{ratio:10.2f}{mark}{flag}")
        else:
            print(f"{q:40s}{cells}{'-':>10s}")
    shared = set(base["queries"]) & set(rounds[-1][1]["queries"])
    tb = sum(base["queries"][q] for q in shared)
    tl = sum(rounds[-1][1]["queries"][q] for q in shared)
    print(f"\nshared-query total: {tb:.1f}s ({base_name}) -> {tl:.1f}s")
    for _, d in rounds:
        rc = d.get("reference_corpus_wordcount")
        if rc:
            print(f"reference corpus: {rc['seconds']}s / {rc['mb_per_s']} MB/s")
    # Host fingerprint per artifact (recorded since r11): if the later
    # round's scaling dropped / steal rose, a uniform row shift is the
    # HOST, not the code — see the PLANS.md r11 worktree control.
    for p, d in rounds:
        hp = d.get("host_probe")
        if hp:
            print(
                f"host ({p}): md5 {hp.get('md5_single_s')}s, "
                f"scaling {hp.get('md5_scaling_x')}x, "
                f"steal {hp.get('steal_pct_under_load')}%"
            )
    print(f"regressions >{REGRESSION_RATIO}x: {flagged or 'none'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
