"""Round-8 row-count probe channel: instrument validation.

The two six-round-driver-red slots carry marker rows whose COUNT packs
`c_a + 101*c_b + 9797*vcode` (docs/QUERIES.md §probe). These tests
prove the instrument itself works:

1. pack/unpack is a bijection over the full field ranges;
2. a REAL byte-class divergence (Java regex `\\s` matches vertical
   tab, RE2's does not) flips the decoded c_a checksum when the oracle
   uses RE2's `\\s` shorthand — the exact failure signature the probe
   exists to catch in the driver environment;
3. the r8 `_java_ws` explicit-class oracle closes that divergence:
   both engines agree bit-for-bit on \\x0B-bearing props.
"""

from __future__ import annotations

import shutil
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em

SRC = "/root/testdata/sf0.001"


def unpack(c: int) -> tuple[int, int, int]:
    return c % 101, (c % 9797) // 101, c // 9797


def test_probe_pack_roundtrip():
    for c_a in (0, 1, 50, 100):
        for c_b in (0, 1, 48, 96):
            for v in (0, 6, 14):
                c = c_a + 101 * c_b + 9797 * v
                assert unpack(c) == (c_a, c_b, v)
                assert c < em._PROBE_RANGE


def _marker_count_spark(spark, sf_dir: str) -> tuple[int, int]:
    rows = em.queries()["json_props_stats"](spark, sf_dir).collect()
    markers = [r for r in rows if r.event_type == em.PROBE_MARKER]
    return len(rows) - len(markers), len(markers)


def _marker_count_duck(sql: str, sf_dir: str) -> tuple[int, int]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    rows = con.execute(sql).fetchall()
    markers = [r for r in rows if r[0] == em.PROBE_MARKER]
    return len(rows) - len(markers), len(markers)


def _vtab_fixture(tmp_path) -> str:
    """sf0.001 clone whose first props row carries a vertical tab
    between the colon and the digits."""
    d = tmp_path / "vtab"
    d.mkdir()
    for t in ("events",):
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        data = tbl.to_pydict()
        data["props"][0] = '{"k":\x0b41}'
        pq.write_table(
            pa.Table.from_pydict(data, schema=tbl.schema),
            str(d / f"{t}.parquet"),
        )
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


def test_probe_catches_vtab_divergence_and_java_ws_closes_it(
    spark, tmp_path
):
    sf_dir = _vtab_fixture(tmp_path)
    base_s, c_spark = _marker_count_spark(spark, sf_dir)

    hardened = em.oracle_sql()["json_props_stats"]
    assert r"[ \t\n\x0B\f\r]" in hardened  # the r8 explicit class
    base_h, c_hard = _marker_count_duck(hardened, sf_dir)

    # reverse the r8 hardening to get the RE2-shorthand oracle the
    # repo shipped before round 8
    legacy = hardened.replace(r" \t\n\x0B\f\r]", r"\s]").replace(
        r"[ \t\n\x0B\f\r]", r"\s"
    )
    base_l, c_legacy = _marker_count_duck(legacy, sf_dir)

    assert base_s == base_h == base_l  # same 5 event-type groups

    # (3) hardened oracle agrees with Spark: same checksums, version
    # field differs by exactly (spark_code - duck_code) * 9797
    a_s, b_s, v_s = unpack(c_spark)
    a_h, b_h, v_h = unpack(c_hard)
    assert (a_s, b_s) == (a_h, b_h)
    assert v_s != v_h  # 4.1 -> 6 vs 1.x -> small code

    # (2) the legacy RE2 shorthand misses the \x0B row's k=41: the
    # probe's c_a (pmod(sum sum_k, 101)) flips and decode localizes it
    a_l, b_l, v_l = unpack(c_legacy)
    assert v_l == v_h  # same engine, same version field
    assert a_l != a_h  # the parse/sum checksum names the divergence
