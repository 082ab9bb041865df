"""Identifier derivation (reference N1/N2, ``code/helpers.py:218-221``,
``code/utils.py:116-130``)."""

from __future__ import annotations

import os
import re


def derive_table_name(file_path: str, schema: str = "public") -> str:
    """``data/My File-1.csv`` → ``public.my_file_1`` (reference N1:
    basename, ``-``/space → ``_``, lowercased)."""
    base = os.path.splitext(os.path.basename(file_path))[0]
    safe = re.sub(r"[-\s]+", "_", base).lower()
    return f"{schema}.{safe}"


def transformed_table(file_path: str, schema: str = "public") -> str:
    return derive_table_name(file_path, schema) + "_transformed"


def agg_table(file_path: str, schema: str = "public") -> str:
    return derive_table_name(file_path, schema) + "_agg"
