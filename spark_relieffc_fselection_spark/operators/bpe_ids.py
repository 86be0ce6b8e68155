"""BPE over ARRAYS OF SYMBOL IDS — the representation that removes
the merge ceiling entirely (the design note operators/bpe.py's tier
comment promised, built out).

The string-path trainer (operators/bpe.py) spends one private-use
character per merge; Unicode has exactly 137,465 such code points, so
a vocabulary past ~137k merges is unreachable there by construction.
Here a word is a tuple of integer symbol ids — base symbols are the
characters' code points (< 0x110000), merge ``m`` allocates id
``MERGE_ID_BASE + m`` — so the id space is unbounded and, as a free
consequence, ANY input text is accepted: merge ids are disjoint from
every possible code point, so the string path's C0/PUA
placeholder-aliasing guard has nothing to guard against.

Semantics are the string path's exactly: the same (count DESC, pair
ASC) argmax (pairs compare as (left_id, right_id) tuples), the same
left-to-right non-overlapping replace, the same incremental
count/occurrence/lazy-heap machinery with amortized heap rebuilds.
PARITY: for vocabularies whose characters are all below U+E000 the
merge sequences are IDENTICAL to operators/bpe.py under the
ord()/placeholder-id mapping (property-tested). Above U+E000 the two
paths may order TIES differently — the string path's placeholder code
points interleave with supplementary-plane input characters, merge
ids never interleave with input — which is exactly why the id order
is the saner total order once the ceiling is gone.

Encoding (serving) is the production tokenizer algorithm: per word,
repeatedly merge the LOWEST-RANK adjacent pair present (leftmost-first
within a rank), driven by a broadcast ``(left, right) -> (rank, id)``
dict — equivalent to applying the chain in order (a merge consumes
its pair everywhere before any later merge can run, and no later
merge can re-create an earlier pair: merged symbols are new ids that
sit between the old neighbors), but O(len^2 x applied) per word
instead of O(len x chain length), which at a 137k+ chain is the
difference between serving and not. Spark-side: one Arrow-batched
``mapInPandas`` over the Zipf-bounded distinct-word vocabulary with
the ranks dict broadcast — corpus tokenization then joins words back
on the (word -> token ids) table, the same 100 TB pattern as the
string path (q156/q164).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: First merge id. Above every Unicode code point (max 0x10FFFF), so
#: merge ids can never alias input characters — no forbidden-character
#: guard is needed on this path.
MERGE_ID_BASE = 0x110000

#: Same driver-collect bound as the string trainer (learn_bpe):
#: callers cap the histogram like any production trainer.
from spark_relieffc_fselection_spark.operators.bpe import (  # noqa: E402
    MAX_BPE_VOCAB_COLLECT,
)

# Module-scope, not inside encode_word_ids_dropout: the dropout
# encoder runs once per word in the Arrow hot path, and a per-call
# import is a sys.modules lookup per word (ADVICE r11). No cycle:
# sampling.py does not import bpe_ids.
from spark_relieffc_fselection_spark.operators.sampling import (  # noqa: E402
    hash_uniform_py,
)


def merge_id(m: int) -> int:
    """Symbol id allocated to merge number ``m`` (1-based)."""
    return MERGE_ID_BASE + m


def learn_bpe_ids(
    vocab: DataFrame,
    n_merges: int | None = None,
    vocab_target: int | None = None,
    max_vocab_words: int | None = None,
    min_count: int = 1,
    word_col: str = "w",
    weight_col: str = "wc",
    byte_level: bool = False,
) -> list[tuple[int, tuple[int, int]]]:
    """The ceiling-free BPE trainer: same architecture as
    :func:`~spark_relieffc_fselection_spark.operators.bpe.learn_bpe`
    (one corpus shuffle for the histogram — the caller's; one bounded
    collect of the top ``max_vocab_words`` words; a driver-local
    incremental merge loop), but over symbol-id tuples, so
    ``n_merges`` has NO upper bound beyond pair supply. Returns
    ``[(merge_id, (left_id, right_id)), ...]`` in merge order; pair
    members may be earlier merge ids.

    No forbidden-character probe: merge ids live above the Unicode
    code-point space, so no input character can alias one (the string
    path must reject C0/PUA input for exactly that reason).

    ``byte_level=True`` trains over UTF-8 BYTES (base ids 0..255 —
    the GPT-2/Llama tokenizer family): a closed 256-symbol base
    alphabet with no <unk> ever, at the cost of tokens that may split
    multi-byte characters (render via :func:`render_id_bytes`, which
    returns bytes for exactly that reason). On pure-ASCII text byte
    ids equal code points, so byte-level and char-level merge
    sequences are IDENTICAL there (tested)."""
    if (n_merges is None) == (vocab_target is None):
        raise ValueError("pass exactly one of n_merges / vocab_target")
    q = vocab.select(word_col, weight_col)
    if min_count > 1:
        q = q.filter(F.col(weight_col) >= min_count)
    if max_vocab_words is not None:
        q = q.orderBy(F.desc(weight_col), F.asc(word_col)).limit(max_vocab_words)
    rows = (
        q.select(word_col, F.col(weight_col).cast("long").alias(weight_col))
        .limit(MAX_BPE_VOCAB_COLLECT + 1)
        .collect()
    )
    if len(rows) > MAX_BPE_VOCAB_COLLECT:
        raise ValueError(
            f"learn_bpe_ids would collect more than {MAX_BPE_VOCAB_COLLECT} "
            "vocabulary rows to the driver — pass max_vocab_words (or "
            "min_count) to bound the training histogram"
        )
    if byte_level:
        words = [
            (tuple(r[word_col].encode("utf-8")), int(r[weight_col]))
            for r in rows
        ]
    else:
        words = [
            (tuple(ord(c) for c in r[word_col]), int(r[weight_col]))
            for r in rows
        ]
    if vocab_target is not None:
        alphabet = {i for w, _ in words for i in w}
        n_merges = max(vocab_target - len(alphabet), 0)
    return _merge_loop_ids(words, n_merges)


def _merge_loop_ids(
    words: list[tuple[tuple[int, ...], int]], n_merges: int
) -> list[tuple[int, tuple[int, int]]]:
    """The incremental merge loop over id tuples — the same counts /
    occurrence-index / lazy-heap / amortized-rebuild machinery as the
    string path's ``_merge_loop`` (see operators/bpe.py for the
    rationale of each piece), with pairs as ``(left, right)`` int
    tuples. Tuple comparison IS the string path's pair-ASC tie rule
    under the sub-U+E000 parity mapping (code-point order ==
    lexicographic string order)."""
    from heapq import heapify, heappop, heappush

    work = list(words)
    counts: dict[tuple[int, int], int] = {}
    occ: dict[tuple[int, int], set[int]] = {}
    for idx, (w, wc) in enumerate(work):
        for i in range(len(w) - 1):
            pr = (w[i], w[i + 1])
            counts[pr] = counts.get(pr, 0) + wc
            occ.setdefault(pr, set()).add(idx)
    heap = [(-c, pr) for pr, c in counts.items()]
    heapify(heap)
    merges: list[tuple[int, tuple[int, int]]] = []
    for m in range(1, n_merges + 1):
        pair = None
        while heap:
            negc, pr = heappop(heap)
            if counts.get(pr, 0) == -negc and negc < 0:
                pair = pr
                break
        if pair is None:  # pair supply exhausted
            break
        nid = merge_id(m)
        merges.append((nid, pair))
        for idx in sorted(occ.get(pair, ())):
            w, wc = work[idx]
            if not _contains_pair(w, pair):
                continue  # stale occurrence from an earlier merge
            for i in range(len(w) - 1):
                old_p = (w[i], w[i + 1])
                left = counts[old_p] - wc
                if left:
                    counts[old_p] = left
                    heappush(heap, (-left, old_p))
                else:
                    del counts[old_p]
                    occ.pop(old_p, None)  # provably all-stale (see bpe.py)
            w2 = _replace_pair(w, pair, nid)
            work[idx] = (w2, wc)
            for i in range(len(w2) - 1):
                new_p = (w2[i], w2[i + 1])
                counts[new_p] = counts.get(new_p, 0) + wc
                occ.setdefault(new_p, set()).add(idx)
                heappush(heap, (-counts[new_p], new_p))
        occ.pop(pair, None)
        if len(heap) > 64 and len(heap) > 8 * len(counts):
            heap = [(-c, pr) for pr, c in counts.items()]
            heapify(heap)
    return merges


def _contains_pair(w: tuple[int, ...], pair: tuple[int, int]) -> bool:
    a, b = pair
    return any(w[i] == a and w[i + 1] == b for i in range(len(w) - 1))


def _replace_pair(
    w: tuple[int, ...], pair: tuple[int, int], nid: int
) -> tuple[int, ...]:
    """Left-to-right non-overlapping replace — str.replace semantics
    on id tuples."""
    a, b = pair
    out: list[int] = []
    i = 0
    n = len(w)
    while i < n:
        if i < n - 1 and w[i] == a and w[i + 1] == b:
            out.append(nid)
            i += 2
        else:
            out.append(w[i])
            i += 1
    return tuple(out)


def encode_word_ids(
    ids: list[int], ranks: dict[tuple[int, int], tuple[int, int]]
) -> list[int]:
    """Rank-based BPE encode of one word (the HF/SentencePiece serving
    algorithm): repeatedly merge the lowest-rank adjacent pair present
    (leftmost-first within the rank, via the left-to-right replace).
    Equivalent to applying the whole chain in order — no later merge
    can re-create an earlier pair — but independent of chain LENGTH,
    which is what makes a 137k+ chain servable."""
    while len(ids) >= 2:
        best_rank = None
        best = None
        for i in range(len(ids) - 1):
            r = ranks.get((ids[i], ids[i + 1]))
            if r is not None and (best_rank is None or r[0] < best_rank):
                best_rank, best = r[0], (ids[i], ids[i + 1], r[1])
        if best is None:
            break
        a, b, nid = best
        out: list[int] = []
        i = 0
        while i < len(ids):
            if i < len(ids) - 1 and ids[i] == a and ids[i + 1] == b:
                out.append(nid)
                i += 2
            else:
                out.append(ids[i])
                i += 1
        ids = out
    return ids


def bpe_ids_encode(
    vocab: DataFrame,
    merges: list[tuple[int, tuple[int, int]]],
    word_col: str = "w",
    weight_col: str = "wc",
    byte_level: bool = False,
) -> DataFrame:
    """Tokenize the distinct-word vocabulary under a trained id-space
    chain: ``(word, wc, token_ids array<long>)``. One Arrow-batched
    ``mapInPandas`` pass with the ranks dict broadcast (merges-sized —
    a 137k-entry dict is a few MB, far under any broadcast concern).
    Corpus tokenization joins words back on this table, never
    re-encoding per occurrence (the q156/q164 pattern)."""
    spark = vocab.sparkSession
    ranks = {pair: (m, nid) for m, (nid, pair) in enumerate(merges, 1)}
    bc = spark.sparkContext.broadcast(ranks)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk = bc.value
        for pdf in batches:
            words, weights, toks = [], [], []
            for w, wc in zip(pdf[word_col], pdf[weight_col]):
                words.append(w)
                weights.append(int(wc))
                base = (
                    list(w.encode("utf-8")) if byte_level
                    else [ord(c) for c in w]
                )
                toks.append(encode_word_ids(base, rk))
            yield pd.DataFrame(
                {word_col: words, weight_col: weights, "token_ids": toks}
            )

    return vocab.select(word_col, weight_col).mapInPandas(
        enc, schema=f"{word_col} string, {weight_col} long, token_ids array<long>"
    )


def bpe_ids_decode(
    encoded: DataFrame,
    merges: list[tuple[int, tuple[int, int]]],
    token_col: str = "token_ids",
    out_col: str = "decoded",
    byte_level: bool = False,
) -> DataFrame:
    """Serving DECODE — the other half of the tokenize round trip:
    expand each row's token ids back to surface text, appended as
    ``out_col``. One Arrow-batched ``mapInPandas`` pass with only the
    merges-sized expand dict broadcast (the exact mirror of
    :func:`bpe_ids_encode`); the per-task render memo makes repeated
    ids O(1) after first expansion, so a row costs O(output chars).
    ``byte_level`` must match the chain's trained mode — byte tokens
    concatenate to valid UTF-8 only at word/row granularity (a single
    token may split a multi-byte character), which is why decode
    happens here and not per token. Corpus decode joins the decoded
    DISTINCT words back by word, the encode pattern in reverse —
    corpus size never enters the Arrow pass."""
    spark = encoded.sparkSession
    expand = {nid: pair for nid, pair in merges}
    bc = spark.sparkContext.broadcast(expand)
    in_cols = encoded.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in encoded.schema.fields
    ) + f", {out_col} string"

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ex = bc.value
        if byte_level:
            bmemo: dict[int, bytes] = {}

            def render(ids) -> str:
                return b"".join(
                    render_id_bytes(int(t), ex, bmemo) for t in ids
                ).decode("utf-8")
        else:
            smemo: dict[int, str] = {}

            def render(ids) -> str:
                return "".join(render_id(int(t), ex, smemo) for t in ids)

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [render(ids) for ids in pdf[token_col]]
            yield pdf

    return encoded.select(*in_cols).mapInPandas(dec, schema=out_schema)


def render_id(
    tid: int, expand: dict[int, tuple[int, int]], memo: dict[int, str] | None = None
) -> str:
    """Expand a token id back to its surface string: base ids are
    code points, merge ids expand recursively through their pair
    (memoized — rendering a whole vocabulary is O(total output
    length), not O(depth x tokens))."""
    if memo is None:
        memo = {}
    out = memo.get(tid)
    if out is not None:
        return out
    if tid < MERGE_ID_BASE:
        out = chr(tid)
    else:
        a, b = expand[tid]
        out = render_id(a, expand, memo) + render_id(b, expand, memo)
    memo[tid] = out
    return out


def encode_word_ids_dropout(
    word: str,
    ranks: dict[tuple[int, int], tuple[int, int]],
    p: float,
    seed: str = "bd0",
    byte_level: bool = False,
) -> list[int]:
    """BPE-DROPOUT (Provilkov et al. 2020) — the BPE twin of subword
    regularization: during encode, each candidate merge SITE is
    dropped with probability ``p``, so every epoch seed yields a
    different (coarser) segmentation of the same word, which
    regularizes the downstream model. ``p=0`` is exact
    :func:`encode_word_ids`; ``p=1`` falls back to characters.

    Deterministic given (seed, p) — the drop decision is the repo's
    portable md5 uniform keyed by (seed, word, the site's CHARACTER
    SPAN in the original word, merge number), so the same site gets
    the same decision whenever it is re-examined as the sequence
    mutates, and runs are reproducible across engines and epochs (the
    hash-sampling principle q57/q80/q175 use). One site merges per
    step (leftmost-lowest-rank among surviving sites), which keeps
    the decision keys stable; each merge shortens the sequence, and
    dropped sites stay dropped, so the loop terminates.

    ``byte_level`` must match the TRAINED chain's mode (code-point
    ids vs UTF-8 byte ids) — a byte-level chain applied to code-point
    ids would silently never merge anything non-ASCII."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"dropout probability must be in [0, 1], got {p}")
    ids = (
        list(word.encode("utf-8")) if byte_level
        else [ord(c) for c in word]
    )
    spans = [(i, i + 1) for i in range(len(ids))]
    while len(ids) >= 2:
        best = None  # (rank, site index, new id)
        for i in range(len(ids) - 1):
            r = ranks.get((ids[i], ids[i + 1]))
            if r is None:
                continue
            m, nid = r
            if best is not None and m >= best[0]:
                continue
            key = f"{seed}|{word}|{spans[i][0]}|{spans[i + 1][1]}|{m}"
            if hash_uniform_py(key) < p:
                continue  # this site is dropped for this epoch
            best = (m, i, nid)
        if best is None:
            break
        _m, i, nid = best
        ids[i : i + 2] = [nid]
        spans[i : i + 2] = [(spans[i][0], spans[i + 1][1])]
    return ids


def bpe_ids_encode_dropout(
    vocab: DataFrame,
    merges: list[tuple[int, tuple[int, int]]],
    p: float,
    seed: str = "bd0",
    word_col: str = "w",
    weight_col: str = "wc",
    byte_level: bool = False,
) -> DataFrame:
    """Vocabulary-level BPE-dropout tokenization: ``(word, wc,
    token_ids array<long>)`` under :func:`encode_word_ids_dropout` —
    one Arrow pass with the ranks dict broadcast, same scale story as
    :func:`bpe_ids_encode`; n augmentation epochs cost n corpus-zero
    passes with n seeds."""
    spark = vocab.sparkSession
    ranks = {pair: (m, nid) for m, (nid, pair) in enumerate(merges, 1)}
    bc = spark.sparkContext.broadcast(ranks)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk = bc.value
        for pdf in batches:
            words, weights, toks = [], [], []
            for w, wc in zip(pdf[word_col], pdf[weight_col]):
                words.append(w)
                weights.append(int(wc))
                toks.append(
                    encode_word_ids_dropout(w, rk, p, seed, byte_level)
                )
            yield pd.DataFrame(
                {word_col: words, weight_col: weights, "token_ids": toks}
            )

    return vocab.select(word_col, weight_col).mapInPandas(
        enc, schema=f"{word_col} string, {weight_col} long, token_ids array<long>"
    )


def render_id_bytes(
    tid: int,
    expand: dict[int, tuple[int, int]],
    memo: dict[int, bytes] | None = None,
) -> bytes:
    """Byte-level rendering: base ids are UTF-8 BYTES (0..255), merge
    ids expand recursively — returns bytes, because a byte-level token
    may legitimately split a multi-byte character (the GPT-2 family's
    defining property); the caller decodes only at word/document
    granularity, where the concatenation is valid UTF-8 again."""
    if memo is None:
        memo = {}
    out = memo.get(tid)
    if out is not None:
        return out
    if tid < MERGE_ID_BASE:
        out = bytes([tid])
    else:
        a, b = expand[tid]
        out = render_id_bytes(a, expand, memo) + render_id_bytes(b, expand, memo)
    memo[tid] = out
    return out


def merge_ranks_from_string_chain(
    merges: list[tuple[str, str]],
) -> list[tuple[int, tuple[int, int]]]:
    """The STRING->IDS serving bridge (VERDICT r11 #4): convert a
    chain trained on the string path (``[(placeholder, pair), ...]``
    from operators/bpe.py learn_bpe / learn_bpe_merges) into the
    id-space representation this module serves, so a string-trained
    tokenizer gets chain-length-independent rank encoding
    (:func:`encode_word_ids` via :func:`bpe_ids_encode`) instead of
    the stacked one-replace-per-merge plan — at 30k merges that is
    the difference between a production serving path and a
    Catalyst-hostile one (the string trainer localCheckpoints every
    8 rounds for exactly this reason, operators/bpe.py).

    The mapping is the property-tested sub-U+E000 parity law (module
    docstring): a base character maps to its code point, merge m's
    placeholder maps to ``merge_id(m)`` = 0x110000+m. Each pair
    symbol is resolved against the placeholders allocated BEFORE it
    (later pairs may contain earlier placeholders); an unknown
    placeholder-range character or a pair that is not exactly two
    symbols means a corrupt or foreign chain — raise, don't
    mis-serve. After bridging, ``render_id`` yields surface text
    directly (base ids are real code points, never placeholders).

    Output feeds the same consumers as :func:`learn_bpe_ids` output:
    ranks for encode, expand for render, save_merges_ids for
    persistence. Parity is pinned by test (stacked-replace encode ==
    bridged rank encode, token for token) and by the q156/q172 gates
    staying hash-green — the bridge touches no trained values."""
    from spark_relieffc_fselection_spark.operators.bpe import (
        merge_placeholder,
    )

    ph_ordinal: dict[str, int] = {}
    out: list[tuple[int, tuple[int, int]]] = []
    for m, (ph, pair) in enumerate(merges, 1):
        if ph != merge_placeholder(m):
            raise ValueError(
                f"corrupt string chain: merge {m} carries placeholder "
                f"U+{ord(ph):04X}, expected "
                f"U+{ord(merge_placeholder(m)):04X} — the chain was "
                "built under a different placeholder-allocation law"
            )
        syms = list(pair)  # code points, incl. supplementary-plane
        if len(syms) != 2:
            raise ValueError(
                f"corrupt string chain: merge {m} pair has "
                f"{len(syms)} symbols, expected 2"
            )
        ids = []
        for c in syms:
            if c in ph_ordinal:
                ids.append(merge_id(ph_ordinal[c]))
            elif (
                0xE000 <= ord(c) <= 0xF8FF
                or 0xF0000 <= ord(c) <= 0xFFFFD
                or 0x100000 <= ord(c) <= 0x10FFFD
            ):  # exactly the trainer's _FORBIDDEN_RANGE PUA tiers
                raise ValueError(
                    f"corrupt string chain: merge {m} pair references "
                    f"placeholder-range U+{ord(c):04X} that no earlier "
                    "merge allocated"
                )
            else:
                ids.append(ord(c))
        ph_ordinal[ph] = m
        out.append((merge_id(m), (ids[0], ids[1])))
    return out


def save_merges_ids(
    spark, merges: list[tuple[int, tuple[int, int]]], path: str
) -> None:
    """Persist an id-space merge chain as parquet ``(m, new_id,
    left_id, right_id)`` — ordinal explicit (merge order is the
    load-bearing contract, exactly like the string path's
    save_merges), ids as longs since they exceed the Unicode range by
    design. repartition(1), not coalesce(1) — the tiny-write lesson
    (SCALE.md round 11)."""
    df = spark.createDataFrame(
        [(i, nid, pair[0], pair[1]) for i, (nid, pair) in enumerate(merges, 1)],
        "m int, new_id long, left_id long, right_id long",
    )
    df.repartition(1).write.mode("overwrite").parquet(path)


def load_merges_ids(spark, path: str) -> list[tuple[int, tuple[int, int]]]:
    """Load an id-space merge chain saved by :func:`save_merges_ids`,
    validating the ordinal sequence AND the id-allocation law
    (new_id == MERGE_ID_BASE + m): a gap, duplicate, or foreign id
    means a corrupt artifact that would silently mis-render tokens."""
    rows = spark.read.parquet(path).orderBy("m").collect()
    for i, r in enumerate(rows, 1):
        if r["m"] is None or int(r["m"]) != i:
            raise ValueError(
                f"corrupt id merge chain at {path}: ordinal {r['m']} at "
                f"position {i} (expected contiguous 1..{len(rows)})"
            )
        if int(r["new_id"]) != merge_id(i):
            raise ValueError(
                f"corrupt id merge chain at {path}: merge {i} carries "
                f"new_id {r['new_id']}, expected {merge_id(i)} — the "
                "artifact was saved under a different id-allocation law"
            )
    return [(int(r["new_id"]), (int(r["left_id"]), int(r["right_id"]))) for r in rows]
