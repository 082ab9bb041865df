"""tools/decode_probe.py: the round-9 gate read-out must decode and
classify correctly — test it against synthetic CORRECTNESS files for
each outcome class before the real one exists."""

from __future__ import annotations

import json
import subprocess
import sys

BASE_ROLL, BASE_JSON = 2399, 5


def _run(tmp_path, counts: dict) -> str:
    p = tmp_path / "correctness.json"
    p.write_text(json.dumps(counts))
    out = subprocess.run(
        [sys.executable, "/root/repo/tools/decode_probe.py", str(p)],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def _pack(c_a: int, c_b: int, v: int) -> int:
    return c_a + 101 * c_b + 9797 * v


def test_decode_names_ca_divergence(tmp_path):
    out = _run(tmp_path, {
        "rolling_7day_revenue": {
            "spark_rows": BASE_ROLL + _pack(60, 68, 6),
            "oracle_rows": BASE_ROLL + _pack(61, 68, 3),
        },
        "json_props_stats": {
            "spark_rows": BASE_JSON + _pack(91, 52, 6),
            "oracle_rows": BASE_JSON + _pack(91, 50, 3),
        },
    })
    assert "DIVERGES at c_a=pmod(sum(rev_cents),101)" in out
    assert "c_a agrees; DIVERGES at c_b=pmod(sum(avg_k_micro),97)" in out
    assert "Spark 4.1" in out and "DuckDB 1.3" in out


def test_decode_names_normalization_when_checksums_agree(tmp_path):
    out = _run(tmp_path, {
        "rolling_7day_revenue": {
            "spark_rows": BASE_ROLL + _pack(60, 68, 6),
            "oracle_rows": BASE_ROLL + _pack(60, 68, 0),
        },
        "json_props_stats": {
            "spark_rows": BASE_JSON + _pack(91, 52, 6),
            "oracle_rows": BASE_JSON + _pack(91, 52, 0),
        },
    })
    assert out.count("both checksums agree") == 2


def test_decode_flags_base_drift(tmp_path):
    out = _run(tmp_path, {
        # counts below the pinned base: probe absent or base drifted
        "rolling_7day_revenue": {"spark_rows": 2399, "oracle_rows": 2399},
        "json_props_stats": {"spark_rows": 4, "oracle_rows": 4},
    })
    # rolling: zero marker rows decode as (0,0,0) — legal; json: below
    # base must be called out loudly
    assert "below pinned base" in out
