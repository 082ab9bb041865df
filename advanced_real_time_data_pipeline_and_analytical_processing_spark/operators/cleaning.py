"""Row cleaning (reference P1/P2 — ``code/helpers.py:46-54``).

The reference trims every string column with an N-deep ``withColumn``
chain; here it is a single projection so the analyzed plan stays flat
(SURVEY.md §4.3-5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def trim_strings(df: DataFrame) -> DataFrame:
    """Trim all string columns in ONE select (not N withColumns)."""
    cols = [
        F.trim(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, StringType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def drop_all_null_rows(df: DataFrame) -> DataFrame:
    """Drop rows where every column is null (reference P2)."""
    return df.na.drop(how="all")


def clean(df: DataFrame) -> DataFrame:
    return drop_all_null_rows(trim_strings(df))
