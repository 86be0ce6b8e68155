"""Unigram-LM (SentencePiece-style) tokenizer primitives over a
word-count vocabulary — the DP counterpart of operators/bpe.py in the
tokenizer-training family (SURVEY §7.4 direction: every step after the
one corpus tokenize is VOCAB-sized, which Zipf bounds far below corpus
size at 100 TB).

* :func:`piece_table` — candidate pieces = every substring (up to
  ``max_piece_len``) of every distinct word, weighted by word
  frequency; score = log2 of the piece's share of total piece mass,
  ROUNDED to 6 decimals. The rounding is load-bearing for
  cross-engine exactness: post-round values parse to the identical
  double in Spark and DuckDB (the q66 log2 precedent), so the
  segmentation DP below — identical recurrence, identical operand
  order — produces bit-identical scores in both engines and its
  arg-max never diverges on libm's last ulp.
* :func:`viterbi_segment` — per-word best segmentation under the
  piece scores (the E-step of SentencePiece's EM, Kudo 2018 shape):
  s[i] = max over piece lengths l of s[i-l] + lp(w[i-l:i]), ties to
  fewer pieces then shorter last piece. Arrow-batched ``mapInPandas``
  with the (vocab-sized) piece dict broadcast; emits the best score
  and piece count per word — backtrack-free, so the state is two
  scalars per position.

Scale: the corpus is touched once (the word histogram the caller
builds); piece counting, scoring, and segmentation are all vocab- or
pieces-sized. Segmentation of the CORPUS then joins words back on the
(word -> pieces) table, never re-running the DP per occurrence.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Score assigned to an absent piece: effectively -inf, but a finite
#: literal so both engines add the SAME double (length-1 pieces always
#: exist, so no feasible word ever keeps this in its best path).
MISSING_PIECE_SCORE = -1e9


def piece_table(
    vocab: DataFrame,
    max_piece_len: int = 4,
    word_col: str = "w",
    weight_col: str = "wc",
) -> DataFrame:
    """``(piece, c, lp)``: every substring of length 1..max_piece_len
    of every vocab word, count-weighted by word frequency; lp =
    ROUND(log2(c / total), 6). Vocab-sized x max_piece_len work."""
    w = F.col(word_col)
    subs = F.flatten(
        F.array(
            *[
                F.when(
                    F.length(w) >= l,
                    F.expr(
                        f"transform(sequence(1, length({word_col}) - {l} + 1),"
                        f" i -> substring({word_col}, i, {l}))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
                for l in range(1, max_piece_len + 1)
            ]
        )
    )
    counts = (
        vocab.select(F.explode(subs).alias("piece"), weight_col)
        .groupBy("piece")
        .agg(F.sum(weight_col).alias("c"))
    )
    total = float(counts.agg(F.sum("c")).first()[0] or 0.0)
    return counts.withColumn(
        "lp", F.round(F.log2(F.col("c") / F.lit(total)), 6)
    )


def _dp(
    w: str, lp: dict, max_piece_len: int, masked: str | None = None
) -> tuple[float, int, list[str]]:
    """The per-word Viterbi recurrence (shared by both emit shapes):
    s[0] = 0; s[i] = max over l in 1..min(max_piece_len, i) of
    s[i-l] + lp(w[i-l:i]); ties prefer fewer pieces, then a shorter
    last piece — a TOTAL order, so the chosen PATH (not just the
    score) is deterministic and oracle-replayable. Returns
    (best score, piece count, pieces in order).

    ``masked`` treats ONE piece as absent — the prune-loss probe
    (SentencePiece's vocabulary-refinement step asks what the corpus
    likelihood loses if a piece is removed). Masking can only lower
    the max; length-1 pieces are never masked, so every word stays
    feasible."""
    n = len(w)
    s = [0.0] * (n + 1)
    npc = [0] * (n + 1)
    bl = [0] * (n + 1)
    for i in range(1, n + 1):
        best = None
        for l in range(1, min(max_piece_len, i) + 1):
            piece = w[i - l : i]
            score = (
                MISSING_PIECE_SCORE
                if piece == masked
                else lp.get(piece, MISSING_PIECE_SCORE)
            )
            v = s[i - l] + score
            key = (v, -(npc[i - l] + 1), -l)
            if best is None or key > best[0]:
                best = (key, v, npc[i - l] + 1, l)
        s[i], npc[i], bl[i] = best[1], best[2], best[3]
    path = []
    pos = n
    while pos > 0:
        path.append(w[pos - bl[pos] : pos])
        pos -= bl[pos]
    path.reverse()
    return s[n], npc[n], path


def viterbi_segment(
    vocab: DataFrame,
    pieces: DataFrame,
    max_piece_len: int = 4,
    word_col: str = "w",
    weight_col: str = "wc",
    emit_pieces: bool = False,
) -> DataFrame:
    """Best segmentation per word: ``(w, wc, best_lp, n_pieces)`` —
    the E-step summary (Kudo 2018 shape).

    DP per word (identical recurrence and operand order as the DuckDB
    oracle's unrolled CTE chain, hence bit-identical doubles given the
    rounded piece scores). The piece dict is driver-collected and
    broadcast — pieces are vocab-substring-bounded, the same budget
    the BPE operators spend.

    ``emit_pieces`` adds the chosen path as a ``pieces array<string>``
    column — one DP pass then serves BOTH the E-step summary and the
    M-step recount (explode + weighted sum), instead of re-running the
    DP per consumer (the q166 fusion).
    """
    spark = vocab.sparkSession
    lp_map = {r["piece"]: float(r["lp"]) for r in pieces.select("piece", "lp").collect()}
    bc = spark.sparkContext.broadcast(lp_map)
    out_schema = f"{word_col} string, {weight_col} long, best_lp double, n_pieces int"
    if emit_pieces:
        out_schema += ", pieces array<string>"

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lp = bc.value
        for pdf in batches:
            words, weights, bests, counts, paths = [], [], [], [], []
            for w, wc in zip(pdf[word_col], pdf[weight_col]):
                best_lp, n_pieces, path = _dp(w, lp, max_piece_len)
                words.append(w)
                weights.append(int(wc))
                bests.append(best_lp)
                counts.append(n_pieces)
                if emit_pieces:
                    paths.append(path)
            out = {
                word_col: words,
                weight_col: weights,
                "best_lp": bests,
                "n_pieces": counts,
            }
            if emit_pieces:
                out["pieces"] = paths
            yield pd.DataFrame(out)

    return vocab.select(word_col, weight_col).mapInPandas(seg, schema=out_schema)


def viterbi_piece_counts(
    vocab: DataFrame,
    pieces: DataFrame,
    max_piece_len: int = 4,
    word_col: str = "w",
    weight_col: str = "wc",
) -> DataFrame:
    """The M-step recount: ``(piece, uses)`` where uses = sum over
    words of word_frequency x times-the-piece-appears-in-the-word's
    best segmentation — the expected piece counts SentencePiece's EM
    feeds back into the next piece-probability estimate. The DP path
    is backtracked per word (deterministic: the tie order is total),
    pieces explode to (piece, wc) rows, and Catalyst's partial
    aggregation collapses them map-side before one pieces-sized
    shuffle."""
    spark = vocab.sparkSession
    lp_map = {r["piece"]: float(r["lp"]) for r in pieces.select("piece", "lp").collect()}
    bc = spark.sparkContext.broadcast(lp_map)

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lp = bc.value
        for pdf in batches:
            ps, ws = [], []
            for w, wc in zip(pdf[word_col], pdf[weight_col]):
                _, _, path = _dp(w, lp, max_piece_len)
                for p in path:
                    ps.append(p)
                    ws.append(int(wc))
            yield pd.DataFrame({"piece": ps, weight_col: ws})

    exploded = vocab.select(word_col, weight_col).mapInPandas(
        seg, schema=f"piece string, {weight_col} long"
    )
    return exploded.groupBy("piece").agg(F.sum(weight_col).alias("uses"))


def reestimate_piece_table(
    uses: DataFrame, uses_col: str = "uses"
) -> DataFrame:
    """The EM re-estimation: new piece scores from the M-step's
    expected counts — lp = ROUND(log2(uses / total_uses), 6), same
    rounding contract as :func:`piece_table` (bit-identical doubles
    across engines, so the next E-step's DP cannot diverge). Support
    shrinks to pieces actually used on best paths; every word stays
    feasible because its previous best path's pieces all survive
    (the Gibbs step of hard EM — see
    test_viterbi_em_iteration_never_decreases_likelihood)."""
    total = float(uses.agg(F.sum(uses_col)).first()[0] or 0.0)
    return uses.select(
        "piece",
        F.round(F.log2(F.col(uses_col) / F.lit(total)), 6).alias("lp"),
    )


def prune_loss(
    vocab: DataFrame,
    pieces: DataFrame,
    candidates: list[str],
    max_piece_len: int = 4,
    word_col: str = "w",
    weight_col: str = "wc",
) -> DataFrame:
    """The EM prune step's loss table: ``(piece, loss)`` where loss =
    sum over words of wc x (best_lp - best_lp_without_piece) — the
    corpus log-likelihood drop if ``piece`` were removed from the
    vocabulary (SentencePiece's vocabulary-refinement criterion; the
    least-loss pieces are pruned first). Candidates must be length >= 2
    (the base alphabet is never pruned, so every word stays feasible).

    Scale: vocab-sized like the other EM steps. Per word, ONE unmasked
    DP; a masked re-run only for the candidates actually ON the word's
    best path (words whose path avoids a piece contribute exactly 0 —
    their optimal path survives the removal). Cross-word summation is
    decimal(38,18), so the per-piece total is order-independent and
    cross-engine exact: each per-word term is a product/difference of
    bit-identical doubles (the rounded piece scores make the DP itself
    bit-identical; see piece_table)."""
    for p in candidates:
        if len(p) < 2:
            raise ValueError(f"prune candidates must have length >= 2, got {p!r}")
    spark = vocab.sparkSession
    lp_map = {r["piece"]: float(r["lp"]) for r in pieces.select("piece", "lp").collect()}
    bc = spark.sparkContext.broadcast((lp_map, set(candidates)))

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lp, cand = bc.value
        for pdf in batches:
            ps, losses = [], []
            for w, wc in zip(pdf[word_col], pdf[weight_col]):
                best, _, path = _dp(w, lp, max_piece_len)
                for p in set(path) & cand:
                    masked_best, _, _ = _dp(w, lp, max_piece_len, masked=p)
                    ps.append(p)
                    losses.append(float(wc) * (best - masked_best))
            yield pd.DataFrame({"piece": ps, "loss": losses})

    exploded = vocab.select(word_col, weight_col).mapInPandas(
        probe, schema="piece string, loss double"
    )
    return exploded.groupBy("piece").agg(
        F.round(
            F.sum(F.col("loss").cast("decimal(38,18)")).cast("double"), 6
        ).alias("loss")
    )
