"""Ranked keyword retrieval (BM25) over a document corpus.

The engine's text stack covers profiling (text.py), dedup (dedup.py),
and ANN over embeddings (similarity.py); this module adds the lexical
retrieval leg: Okapi BM25 scoring of a fixed query-term set, entirely
in Catalyst expressions.

Shape, and why it scales:

- One scan tokenizes and measures document length; corpus-level
  scalars (N, avgdl) come from one tiny aggregate job. Document
  lengths are integer token counts, so their sum — and therefore
  avgdl — is exact regardless of summation order (engine-portable).
- The explode is filtered to the query terms *before* any shuffle, so
  the per-term aggregate carries only matching (doc, term) rows — for
  a handful of query terms that is a vanishing fraction of the corpus.
- Document frequencies (one row per query term) broadcast back; the
  corpus side never shuffles for the join.
- The per-document total is built by conditional aggregation in the
  fixed query-term order — NOT a floating sum over an unordered group
  — so the double-precision result is bit-identical across engines
  and re-runs.

At 100 TB: scan-heavy, shuffle-light (the only exchange carries
(doc_id, term, tf) for matched terms). For interactive workloads you
would materialize the (term, doc_id, tf, dl) inverted index once with
write_bucketed(term) and reuse it across queries — the scoring
pipeline below is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.5,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.

    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)  [Robertson-Sparck
    Jones with the +1 floor, the Lucene form]; score(D) = sum over
    matched terms of idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

    Returns (id, bm25, rank), rank 1..k, ties broken by id.
    """
    toked = docs.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    ).select("_id", "_toks", F.size("_toks").cast("double").alias("_dl"))

    stats = toked.agg(
        F.count(F.lit(1)).alias("n"), F.avg("_dl").alias("avgdl")
    ).first()
    n_docs, avgdl = float(stats.n), float(stats.avgdl)

    matched = toked.select(
        "_id", "_dl", F.explode("_toks").alias("term")
    ).filter(F.col("term").isin(list(query_terms)))
    tf = matched.groupBy("_id", "_dl", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))

    idf = F.log((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("_dl") / avgdl)
    per_term = tf.join(F.broadcast(df_), "term").select(
        "_id", "term", (idf * (F.col("tf") * (k1 + 1.0)) / norm).alias("_s")
    )

    # Fixed-order conditional sum: term order is the caller's list, so
    # the floating-point addition order is deterministic and matches
    # the oracle's identically-ordered expression.
    parts = [
        F.coalesce(
            F.sum(F.when(F.col("term") == t, F.col("_s"))), F.lit(0.0)
        )
        for t in query_terms
    ]
    total_expr = parts[0]
    for p in parts[1:]:
        total_expr = total_expr + p
    scored = per_term.groupBy("_id").agg(F.round(total_expr, 6).alias("bm25"))

    from pyspark.sql import Window

    w = Window.orderBy(F.col("bm25").desc(), F.col("_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_id").alias(id_col), "bm25", "rank")
    )
