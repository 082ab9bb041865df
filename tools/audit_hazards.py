"""Static audit of the two confirmed cross-engine hazard classes
(VERDICT r6 next-round #4) over every oracle in oracle_sql():

  A. WINDOW NULL-ORDERING — every window ORDER BY key in an oracle,
     classified:
       pinned        explicit NULLS FIRST/LAST
       flag-guarded  a leading (k IS NOT NULL) boolean key
       filtered      the oracle filters the key's source NULL-free
                     (WHERE ... IS NOT NULL appears for the key)
       nonnull       key is non-null by construction (row_number,
                     rank, count, ntile, generate_series grains)
       UNGUARDED     none of the above — review by hand
     Spark sorts ASC NULLS FIRST, DuckDB NULLS LAST, so any UNGUARDED
     nullable ASC key is a live silent-values channel.  DATE-typed
     keys are worse: DuckDB 1.0.0's window sort mis-places or DROPS
     NULL DATE rows regardless of pin (measured, r7) — the only safe
     mirror is filtering NULL dates out before the window.

  B. INT64 SCALING — every `* 1000000`-class multiplication in an
     oracle, classified WIDENED if the multiplicand text carries a
     HUGEINT/DECIMAL cast or comes from a sum() (DuckDB promotes
     sum(BIGINT) to HUGEINT), else UNWIDENED for review.  Spark wraps
     silently with ANSI off; DuckDB either stays exact (HUGEINT) or
     errors — both divergence signatures.

The static pass is the MAP; the hostile-data sweep
(tools/hostile_data_sweep.py over testdata_hostile_nonan, NULLs in
every nullable column + int64-edge magnitudes) is the TERRITORY — a
site is only proven safe by the sweep's full-registry PASS.  Run both.

Usage: python tools/audit_hazards.py [--verbose]
Writes docs/HAZARD_AUDIT.md and prints the summary counts.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

NONNULL_FUNCS = re.compile(
    r"\b(row_number|rank|dense_rank|ntile|count)\s*\(|generate_series|"
    r"\brn\b|\bisland\b|\bsession_id\b|\bburst_id\b|\bchunk_start\b"
)
# identifiers that are NON-NULL by fixture schema (primary keys /
# generated ids / grains derived from them)
NONNULL_IDS = re.compile(
    r"\b(doc_id|vec_id|event_id|o_orderkey|o_custkey|l_orderkey|"
    r"l_partkey|l_linenumber|p_partkey|s_suppkey|c_custkey|n_nationkey|"
    r"r_regionkey|user_id|decile|quintile|bucket|seg|cell|lag_k|b|i|g|"
    r"band|shard_id|pos|idx|k)\b"
)
PIN = re.compile(r"NULLS\s+(FIRST|LAST)", re.I)
FLAG = re.compile(r"IS\s+NOT\s+NULL\s*\)", re.I)
SCALE = re.compile(r"\*\s*(1000000000|1000000|10000|100)\b")
WIDE = re.compile(r"HUGEINT|DECIMAL\s*\(|INT128", re.I)


def split_keys(order_clause: str) -> list[str]:
    # split on commas not inside parens
    keys, depth, cur = [], 0, []
    for ch in order_clause:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            keys.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        keys.append("".join(cur).strip())
    return [k for k in keys if k]


def window_order_clauses(sql: str) -> list[str]:
    out = []
    for m in re.finditer(r"ORDER BY", sql):
        # only windows: inside OVER (...) or WINDOW w AS (...)
        prefix = sql[: m.start()]
        # find the nearest unclosed '(' before this ORDER BY
        depth = 0
        opened = None
        for i in range(m.start() - 1, -1, -1):
            c = sql[i]
            if c == ")":
                depth += 1
            elif c == "(":
                if depth == 0:
                    opened = i
                    break
                depth -= 1
        if opened is None:
            continue  # top-level ORDER BY — comparator sorts anyway
        head = sql[max(0, opened - 30) : opened].upper()
        if "OVER" not in head and "AS" not in head:
            continue
        # clause text: from ORDER BY to the matching close paren /
        # frame spec
        rest = sql[m.end() :]
        depth = 0
        end = len(rest)
        for i, c in enumerate(rest):
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    end = i
                    break
                depth -= 1
        clause = rest[:end]
        clause = re.split(
            r"\b(ROWS|RANGE|GROUPS)\s+BETWEEN|\b(ROWS|RANGE|GROUPS)\s+UNBOUNDED",
            clause,
        )[0]
        out.append(clause.strip())
    return out


def classify_key(key: str, sql: str) -> str:
    if PIN.search(key):
        return "pinned"
    if FLAG.search(key) or key.strip().upper().startswith("("):
        if "IS NOT NULL" in key.upper():
            return "flag-guarded"
    if re.search(r"\bDESC\b", key, re.I):
        # Spark DESC defaults NULLS LAST and so does DuckDB — the one
        # direction the engines agree on
        return "desc-agreeing"
    if NONNULL_FUNCS.search(key):
        return "nonnull"
    base_ids = re.sub(r"\s+(ASC|DESC)\s*$", "", key.strip(), flags=re.I)
    idents = re.findall(r"[A-Za-z_][A-Za-z_0-9]*", base_ids)
    if idents and all(
        NONNULL_IDS.fullmatch(i) or i in ("epoch_us", "CAST", "AS",
                                          "BIGINT", "abs", "md5", "VARCHAR")
        for i in idents
    ):
        return "nonnull"
    base = re.sub(r"\s+(ASC|DESC)(\s+LIMIT\s+\d+)?\s*$", "", key.strip(),
                  flags=re.I)
    ident = re.findall(r"[A-Za-z_][A-Za-z_0-9]*", base)
    # derived-key -> source-column map (the oracles alias epoch/date
    # derivations of ts / o_orderdate under these short names)
    derived = {
        "t": ["ts"], "us": ["ts"], "day": ["ts", "o_orderdate"],
        "od": ["o_orderdate"], "month": ["o_orderdate"],
        "ym": ["o_orderdate"], "month_idx": ["o_orderdate"],
        "vq": ["value"], "x": ["value", "ts"], "y": ["value", "ts"],
        "q": ["value", "n_chars"], "slope": ["value", "ts"],
    }
    candidates = set(ident)
    for i in ident:
        candidates.update(derived.get(i, []))
    for name in candidates:
        if re.search(
            rf"\b{re.escape(name)}\b\s+IS\s+NOT\s+NULL", sql, re.I
        ):
            return "filtered"
    return "UNGUARDED"


def main() -> int:
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    lines = ["# Hazard audit — window null-ordering + int64 scaling", ""]
    counts = {"pinned": 0, "flag-guarded": 0, "filtered": 0, "nonnull": 0,
              "desc-agreeing": 0, "UNGUARDED": 0,
              "scale_widened": 0, "scale_unwidened": 0}
    unguarded_sites = []
    unwidened_sites = []
    for name, sql in sorted(oracles.items()):
        for clause in window_order_clauses(sql):
            for key in split_keys(clause):
                cls = classify_key(key, sql)
                counts[cls] += 1
                if cls == "UNGUARDED":
                    unguarded_sites.append((name, key))
        for m in SCALE.finditer(sql):
            ctx = sql[max(0, m.start() - 160) : m.end() + 40]
            if WIDE.search(ctx) or re.search(r"sum\s*\(", ctx, re.I):
                counts["scale_widened"] += 1
            else:
                counts["scale_unwidened"] += 1
                unwidened_sites.append((name, " ".join(ctx.split())[-120:]))
    lines.append(f"counts: {counts}")
    lines.append("")
    lines.append("## UNGUARDED window order keys (manual review)")
    for name, key in unguarded_sites:
        lines.append(f"- `{name}`: `{' '.join(key.split())[:100]}`")
    lines.append("")
    lines.append("## UNWIDENED scalings (manual review)")
    for name, ctx in unwidened_sites:
        lines.append(f"- `{name}`: `...{ctx}`")
    lines.append("")
    lines.append(
        "Empirical gate: `tools/hostile_data_sweep.py testdata_hostile_nonan`"
        " must be all-PASS — the fixture carries NULLs in every nullable"
        " column and int64-edge magnitudes, so every live site above"
        " diverges there if actually unsafe."
    )
    with open("/root/repo/docs/HAZARD_AUDIT.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"window keys: {counts}")
    print(f"unguarded: {len(unguarded_sites)}, unwidened: {len(unwidened_sites)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
