"""Independent comparator sweep — written from scratch this session,
deliberately NOT sharing code with tools/driver_gate_replica.py or
tools/check_oracle.py: Spark rows via collect() -> (value, type-tag)
multisets; DuckDB via fetchall() on the same connection config. A
comparator bug in the standing tools would have to be independently
reproduced here to stay hidden."""
import sys, math, json
from collections import Counter

sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as em
from advanced_real_time_data_pipeline_and_analytical_processing_spark.catalog import TABLES
from advanced_real_time_data_pipeline_and_analytical_processing_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
names = sys.argv[2:] or None

def tag(v):
    # exact value + coarse type class; floats compared bit-exactly via repr
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))
    if isinstance(v, (list, tuple)):
        return ("list", tuple(tag(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, tag(x)) for k, x in v.items())))
    return (type(v).__name__, str(v))

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return tuple(sorted(cols)), Counter(
        tuple(tag(r[i]) for i in order) for r in rows
    )

spark = get_spark("indep-check", cpus=8, shuffle_partitions=8)
con = duckdb.connect()
con.execute("SET temp_directory = '/tmp/indep_duck'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, os_ = em.queries(), em.oracle_sql()
todo = names or [n for n in qs if n in os_]
bad = 0
for n in todo:
    try:
        sdf = qs[n](spark, SF)
        s_cols, s_ms = canon(sdf.columns, [tuple(r) for r in sdf.collect()])
        cur = con.execute(os_[n])
        o_cols = [d[0] for d in cur.description]
        o_ms_cols, o_ms = canon(o_cols, cur.fetchall())
        if s_cols != o_ms_cols:
            print(f"RED  {n}: cols {s_cols} vs {o_ms_cols}"); bad += 1
        elif s_ms != o_ms:
            only_s = list((s_ms - o_ms).items())[:2]
            only_o = list((o_ms - s_ms).items())[:2]
            print(f"RED  {n}: multiset diff spark-only={only_s} oracle-only={only_o}")
            bad += 1
        else:
            print(f"ok   {n}: {sum(s_ms.values())} rows")
    except Exception as e:
        print(f"ERR  {n}: {str(e)[:150]}"); bad += 1
print(f"independent sweep: {len(todo)-bad}/{len(todo)} agree")
sys.exit(1 if bad else 0)
