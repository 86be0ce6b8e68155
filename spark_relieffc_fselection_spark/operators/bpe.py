"""BPE tokenizer training + application over a word-count vocabulary.

THE scale property of BPE (SURVEY §7.4 text-analysis north star): the
corpus is touched exactly once — for the word histogram — and every
merge round AND the encode run over the DISTINCT-WORD vocabulary
weighted by counts, which Zipf's law bounds far below corpus size at
100 TB. Merge application is a literal (non-regex) left-to-right
replace, identical in Spark and DuckDB (the q153/q156 oracle parity),
with one private-use placeholder character per merge.

Used by queries/text_q.py q153 (induction) and q156 (encode); the
reconstruction property (every word == the concatenation of its
rendered tokens, i.e. encoding is lossless) is pinned in
tests/test_textstats.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Placeholder for merge m is chr(m) (m >= 1): control characters never
#: produced by the tokenizer's normalization, so replaces can't collide
#: with surface text.


def _pair_counts(vocab: DataFrame, word_col: str = "w", weight_col: str = "wc") -> DataFrame:
    """Adjacent symbol-pair counts weighted by word frequency —
    vocab-sized, never corpus-sized."""
    return (
        vocab.select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, length({word_col}) - 1),"
                    f" i -> substring({word_col}, i, 2))"
                )
            ).alias("pair"),
            weight_col,
        )
        .groupBy("pair")
        .agg(F.sum(weight_col).alias("wcnt"))
    )


def learn_bpe_merges(
    vocab: DataFrame,
    n_merges: int,
    word_col: str = "w",
    weight_col: str = "wc",
) -> list[tuple[str, str]]:
    """Greedy BPE induction: ``n_merges`` rounds of (count pairs ->
    take the (wcnt DESC, pair ASC) argmax -> replace it with the next
    placeholder). Returns [(placeholder, pair), ...] in merge order;
    pairs may contain earlier placeholders. Each round is one
    vocab-sized aggregation collapsing to ONE driver row; the replace
    chain stays lazy over the caller's (ideally localized) vocab."""
    merges: list[tuple[str, str]] = []
    v = vocab
    for m in range(1, n_merges + 1):
        top = (
            _pair_counts(v, word_col, weight_col)
            .orderBy(F.desc("wcnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:  # pair supply exhausted (tiny corpus)
            break
        pair = top[0]["pair"]
        merges.append((chr(m), pair))
        v = v.select(
            F.replace(F.col(word_col), F.lit(pair), F.lit(chr(m))).alias(word_col),
            weight_col,
        )
    return merges


def bpe_apply(
    vocab: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "w",
) -> DataFrame:
    """Apply the merge chain in order: every word's characters become
    the final symbol sequence (one char = one token id). Vocab-sized;
    corpus-level token stats come from joining the result back on the
    word, never from re-tokenizing the corpus."""
    out = F.col(word_col)
    for ph, pair in merges:
        out = F.replace(out, F.lit(pair), F.lit(ph))
    return vocab.withColumn(word_col, out)


def bpe_render(symbol: Column | str, merges: list[tuple[str, str]]) -> Column:
    """Expand a symbol (or any placeholder-bearing string) back to its
    surface form: replaces run in REVERSE merge order because later
    pairs may contain earlier placeholders."""
    out = F.col(symbol) if isinstance(symbol, str) else symbol
    for ph, pair in reversed(merges):
        out = F.replace(out, F.lit(ph), F.lit(pair))
    return out
