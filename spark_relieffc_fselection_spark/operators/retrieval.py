"""BM25 sparse retrieval over the document corpus.

Sparse lexical retrieval is the workhorse first stage of RAG data
pipelines (and the classic pairing with the embedding ANN operators
in :mod:`.simsearch`): score documents for a bag of query terms with
BM25 (Robertson/Sparck Jones; the Okapi formulation with the
Lucene-style non-negative idf) and keep the top-k.

Design (Spark-first, one pass over tokens):

* Tokenize with a portable ``lower`` + split-on-``[^a-z]+`` — the
  exact expression DuckDB spells as ``regexp_split_to_array``, which
  is what makes the oracle possible.
* Document lengths and (N, avgdl) corpus stats come from the same
  token explode; corpus stats stay a 1-row DataFrame cross-joined in
  (never a driver collect), df(term) is a terms-sized aggregate
  broadcast back.
* Only tokens matching the query terms survive the explode filter, so
  the per-(doc, term) tf aggregate shuffles O(matching tokens), not
  the corpus.
* Final top-k is a rank window over per-doc scores — scores are
  summed as DECIMAL(38,18) so the 2-8 per-term doubles add
  order-insensitively, and ranked on the rounded score with doc id as
  total tiebreak (deterministic under shuffle).

At 100 TB: everything is hash-partitioned aggregates + broadcast
dims; the only corpus-sized shuffle is the (doc, term) tf combine,
which map-side partial aggregation collapses to near-zero for rare
terms. The global top-k window runs over docs-with-matches; for stop-
word-ish query terms swap the window for the bounded per-partition
top-k used by q05 (TakeOrderedAndProject handles it automatically
when k is small).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(38,18)"

K1 = 1.2
B = 0.75


def tokenize(docs: DataFrame, id_col: str, text: str) -> DataFrame:
    """(id, term) rows: lowercased, split on runs of non-letters."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.col(text)), "[^a-z]+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query ``terms``.

    score(d) = sum over query terms t of
      ln((N - df + 0.5)/(df + 0.5) + 1) * tf*(k1+1) /
        (tf + k1*(1 - b + b*dl/avgdl))

    Returns ``(id, score, rank)``, rank 1..k, ties broken by id.
    """
    toks = tokenize(docs, id_col, text)
    dl = toks.groupBy(id_col).agg(F.count("*").alias("_dl"))
    stats = dl.agg(
        F.count("*").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("_tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("_df"))

    idf = F.log(
        (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    tf_part = (F.col("_tf") * (k1 + 1.0)) / (
        F.col("_tf")
        + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
    )
    per_term = tf.join(F.broadcast(df_t), "term").join(
        dl, id_col
    ).crossJoin(F.broadcast(stats))

    scored = (
        per_term.withColumn("_s", (idf * tf_part).cast(DEC))
        .groupBy(id_col)
        .agg(F.round(F.sum("_s").cast("double"), 6).alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
