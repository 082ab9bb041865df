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

from advanced_real_time_data_pipeline_and_analytical_processing_spark.plans.materialize import materialize

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


def sparse_tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    df_cap: int = 50,
    threshold: float = 0.5,
    idf_scale: int = 1000,
) -> DataFrame:
    """All-pairs sparse TF-IDF cosine similarity >= threshold via an
    INVERTED-INDEX self-join — the lexical complement to MinHash
    (dedup.py) and embedding ANN (similarity.py): exact cosine over
    sparse bag-of-bigrams vectors, no embeddings needed.

    Shape, and why it survives 100 TB:
    - terms are word BIGRAMS (unigram vocabularies are too dense to
      index); one scan builds (doc, term, tf).
    - the fan-out bound is the ABSOLUTE df cap: terms appearing in
      more than ``df_cap`` documents are dropped BEFORE the self-join,
      so candidate generation costs sum(df^2) <= df_cap * postings —
      LINEAR in corpus size. (A fractional cap — df <= x% of N — grows
      with the corpus and turns the join quadratic at scale: measured
      89.8x wall-clock for 10x data on this corpus before the switch.)
      A term shared by hundreds of documents carries ~no cosine signal
      but would dominate the join; identical documents keep cosine 1.0
      under any pruning — their pruned vectors are still identical.
    - the per-pair dot product is a hash aggregate over shared terms;
      one shuffle on (id_a, id_b). Norms join back per doc id.

    Cross-engine exactness: idf = ln(N/df) is quantized to integer
    ``idf_scale``-ths (milli-nats by default) so every weight, dot
    product, and squared norm is an exact BIGINT — summation order
    cannot matter (same discipline as lm.py's micro-nat NLL). The only
    float ops are the final sqrt/divide on identical integers, which
    IEEE-754 rounds identically everywhere; scores are then rounded to
    6 for the emitted column.

    Returns (id_a, id_b, cos_sim) with id_a < id_b.
    """
    from .text import bigrams_from_tokens, tokens

    toked = docs.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    )
    tf = (
        toked.select("_id", F.explode(bigrams_from_tokens(F.col("_toks"))).alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # integer-quantized idf over the surviving (rare-enough) terms
    kept = (
        dft.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") <= F.lit(int(df_cap)))
        .select(
            "term",
            F.round(
                F.log(F.col("n").cast("double") / F.col("df")) * idf_scale
            )
            .cast("bigint")
            .alias("idf_q"),
        )
    )
    w = tf.join(kept, "term").select(
        "_id", "term", (F.col("tf") * F.col("idf_q")).alias("w")
    )
    # The weighted inverted index feeds THREE consumers (norms + both
    # sides of the self-join); un-materialized, each consumer re-runs
    # the whole tokenize→explode→aggregate lineage (the
    # media_phash_pairs recompute hazard — see verify SKILL.md).
    # materialize() (persist since r14) computes it once and keeps
    # stats/partitioning visible to the planner.
    w = w.transform(materialize)
    norms = w.groupBy("_id").agg(F.sum(F.col("w") * F.col("w")).alias("ssq"))
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norms.select(F.col("_id").alias("id_a"), F.col("ssq").alias("ssq_a"))
    nb = norms.select(F.col("_id").alias("id_b"), F.col("ssq").alias("ssq_b"))
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("ssq_a").cast("double")) * F.sqrt(F.col("ssq_b").cast("double"))
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .filter(cos >= F.lit(threshold))
        .select("id_a", "id_b", F.round(cos, 6).alias("cos_sim"))
    )
