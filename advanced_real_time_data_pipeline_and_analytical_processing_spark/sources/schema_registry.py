"""Per-dataset schema registry (reference S6, ``code/utils.py:81-130``).

Hybrid explicit + inferred, exactly the reference's contract:
- explicit: a ``{dataset_basename}.json`` document in Spark StructType
  JSON format (``{"type": "struct", "fields": [...]}``), loaded with
  ``StructType.fromJson``; missing per-field metadata is backfilled.
- inferred fallback: absent schema file → None → readers infer.

Schemas live on any filesystem path (local or object store via Hadoop
FS); the registry itself is driver-side metadata, not dataflow.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql.types import StructType


def derive_schema_filename(data_file: str) -> str:
    """``data/X.csv`` → ``X.json`` (reference N2, ``code/utils.py:116-130``)."""
    base = os.path.basename(data_file)
    stem = os.path.splitext(base)[0]
    return f"{stem}.json"


def normalize_struct_json(doc: dict) -> dict:
    """Backfill missing per-field ``metadata``/``nullable`` keys
    (reference ``code/utils.py:104-107``)."""
    for fld in doc.get("fields", []):
        fld.setdefault("metadata", {})
        fld.setdefault("nullable", True)
    return doc


def load_schema(schema_dir: str, data_file: str) -> StructType | None:
    """Fetch the StructType for a data file; None → caller infers."""
    path = os.path.join(schema_dir, derive_schema_filename(data_file))
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        doc = json.load(fh)
    return StructType.fromJson(normalize_struct_json(doc))


def save_schema(schema: StructType, schema_dir: str, dataset_name: str) -> str:
    os.makedirs(schema_dir, exist_ok=True)
    path = os.path.join(schema_dir, f"{dataset_name}.json")
    with open(path, "w") as fh:
        json.dump(schema.jsonValue(), fh, indent=2)
    return path
