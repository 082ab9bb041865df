"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline (Sudhanshu132/Advanced-Real-Time-Data-Pipeline-and-
Analytical-Processing): streaming file ingest, declarative validation +
quarantine, lineage enrichment, grouped statistical aggregation — plus
the large-scale extension surface (joins/windows/set-ops, dedup,
similarity search, text analysis, multimodal columns, event-time
streaming).

Everything is declared through the DataFrame/SQL API so Catalyst +
Tungsten choose physical strategy; Python UDFs appear only where the
built-in operators genuinely cannot express the semantics (Arrow-batched
Pandas UDFs, never row-at-a-time).
"""

from advanced_real_time_data_pipeline_and_analytical_processing_spark.session import get_spark
from advanced_real_time_data_pipeline_and_analytical_processing_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]
