"""Document chunking: split long documents into overlapping
token-window chunks (the RAG / context-window-preparation primitive).

Each document yields ceil(max(n_tokens - overlap, 1) / stride) chunks
of up to ``chunk_tokens`` tokens, consecutive chunks sharing
``overlap`` tokens. Pure Catalyst: tokenize once, generate chunk
start offsets with ``sequence`` (executor-side, per row), explode,
slice — no UDF, no shuffle until the caller aggregates.

Scale: map-only fan-out; output rows ~ corpus tokens / stride. The
chunk text is materialized only if the caller selects it — projection
pruning drops the slice for metadata-only queries (chunk counts,
length audits)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_idx, chunk_start, chunk_n_tokens, chunk_text) — one
    row per chunk, chunk_idx 0-based, chunk_start the 0-based token
    offset. Documents shorter than one chunk yield exactly one chunk.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # NULL text yields NO chunks (a NULL token array would otherwise
    # ride greatest(NULL-overlap, 0) -> one phantom empty chunk);
    # filter the raw column, not the token array — the array probe
    # would tokenize twice after projection collapse
    toked = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .withColumn("_n", F.size("_toks"))
    )
    # starts: 0, stride, 2*stride, ... while start < max(n - overlap, 1)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            (F.col("_n") - F.lit(overlap) - 1), F.lit(0)
        ),
        F.lit(stride),
    )
    exploded = toked.select(
        id_col,
        "_toks",
        "_n",
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    chunk = F.slice(
        F.col("_toks"), F.col("chunk_start") + 1, F.lit(chunk_tokens)
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        "chunk_start",
        F.size(chunk).alias("chunk_n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )
