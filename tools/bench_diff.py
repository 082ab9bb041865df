"""Compare two bench JSON lines (e.g. BENCH_r01.json vs a fresh
`python bench.py` capture) and print the significant movers:

    python tools/bench_diff.py BENCH_r01.json /tmp/bench_now.json

A query is flagged when it moved more than 30% AND more than 0.5 s —
below that is run-to-run JVM/GC noise on this suite (measured swings
of +/-15% on identical code). New and removed queries are listed
separately so a total-seconds change is attributable."""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept either a raw `bench.py` output line or the driver's
    BENCH_r{N}.json wrapper (bench line under 'parsed')."""
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        obj = json.loads(text.strip().splitlines()[-1])
    if "queries" not in obj and "parsed" in obj:
        obj = obj["parsed"]
    if not isinstance(obj, dict) or "queries" not in obj:
        sys.exit(
            f"{path}: no per-query timings (the driver wrapper's 'parsed' "
            "field is null when its bench capture was truncated — "
            "BENCH_r03/BENCH_r04 have this; use a bench.py capture or "
            "BENCH_ISOLATE_r05.json instead)"
        )
    return obj


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    ma, mb = a.get("mode", "shared"), b.get("mode", "shared")
    if ma != mb:
        # isolate numbers sit ~30-60% above shared-suite numbers for
        # the same code (cold JVM per query) — see docs/BENCH_NOTES.md
        print(
            f"WARNING: comparing mode={ma} against mode={mb} — "
            "cross-mode deltas are mostly harness, not code; compare "
            "isolate-vs-isolate or shared-vs-shared."
        )
    # failed queries are recorded as -1.0 and excluded from 'value', so
    # totals over different failure sets are not comparable — restrict
    # the headline comparison to the intersection of SUCCEEDED queries.
    ok_a = {q: v for q, v in qa.items() if v >= 0}
    ok_b = {q: v for q, v in qb.items() if v >= 0}
    fa = len(qa) - len(ok_a)
    fb = len(qb) - len(ok_b)
    if fa or fb:
        print(
            f"WARNING: partial artifacts ({fa} / {fb} failed queries) — "
            "totals below are restricted to the intersection of "
            "succeeded queries."
        )
    both = set(ok_a) & set(ok_b)
    ta = sum(ok_a[q] for q in both)
    tb = sum(ok_b[q] for q in both)
    print(
        f"total: {a['value']:.1f}s ({len(qa)} queries, {ma}) -> "
        f"{b['value']:.1f}s ({len(qb)} queries, {mb})"
    )
    print(f"intersection ({len(both)} succeeded in both): {ta:.1f}s -> {tb:.1f}s")
    # registry changes come from the FULL key sets; a query present in
    # both but failed (-1.0) in one is a regression/fix, not an edit —
    # report those separately so a regression-to-failure can't
    # masquerade as "removed".
    added = sorted(set(qb) - set(qa))
    removed = sorted(set(qa) - set(qb))
    newly_failing = sorted(q for q in set(qa) & set(qb) if qa[q] >= 0 > qb[q])
    newly_passing = sorted(q for q in set(qa) & set(qb) if qb[q] >= 0 > qa[q])
    qa, qb = ok_a, ok_b
    if added:
        print(f"added ({sum(qb[q] for q in added if q in qb):.1f}s):", ", ".join(added))
    if removed:
        print(f"removed ({sum(qa[q] for q in removed if q in qa):.1f}s):", ", ".join(removed))
    if newly_failing:
        print("NEWLY FAILING:", ", ".join(newly_failing))
    if newly_passing:
        print("newly passing:", ", ".join(newly_passing))
    movers = []
    for q in set(qa) & set(qb):
        d = qb[q] - qa[q]
        if abs(d) > 0.5 and abs(d) > 0.3 * qa[q]:
            movers.append((d, q))
    for d, q in sorted(movers, reverse=True):
        print(f"{'+' if d > 0 else ''}{d:6.2f}s  {q}: {qa[q]:.2f} -> {qb[q]:.2f}")
    if not movers:
        print("no significant per-query movement")


if __name__ == "__main__":
    main()
