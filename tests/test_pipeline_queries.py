"""Semantic invariants for the round-3 pipeline queries (q79-q83).

The oracle gate already hash-verifies values against DuckDB; these
tests pin the PROPERTIES each operator promises — partition/coverage
invariants the hash can't articulate on its own.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from spark_relieffc_fselection_spark.queries.dedup_q import (
    q81_incremental_dedup,
)
from spark_relieffc_fselection_spark.queries.text_q import q83_pii_scrub
from spark_relieffc_fselection_spark.queries.trainprep_q import (
    N_SHARDS,
    q79_shuffle_shards,
    q80_hash_uniform_sample,
    q82_filter_funnel,
)
from spark_relieffc_fselection_spark.operators.textstats import PII_PATTERNS
from spark_relieffc_fselection_spark.sources import load_table


def test_shuffle_shards_cover_corpus(spark):
    docs_n = load_table(spark, SF_DIR, "documents").count()
    rows = q79_shuffle_shards(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == docs_n
    assert all(0 <= r["shard"] < N_SHARDS for r in rows)
    # md5 keys are 32-char lowercase hex and ordered within each shard
    for r in rows:
        assert len(r["first_key"]) == 32 and r["first_key"] <= r["last_key"]


def test_hash_uniform_sample_rates_and_bounds(spark):
    rows = q80_hash_uniform_sample(spark, SF_DIR).collect()
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_total"]
        assert 0.2 <= r["target_rate"] <= 1.0
    # sources with target_rate 1.0 keep everything (u < 1.0 * 2^24 always)
    full = [r for r in rows if r["target_rate"] == 1.0]
    assert full and all(r["n_kept"] == r["n_total"] for r in full)


def test_hash_uniform_sample_is_nested(spark):
    """A lower-rate sample is a subset of a higher-rate one (the
    composability property the docstring promises): the kept set is a
    hash-order prefix, so dropping the rate only removes docs."""
    docs = load_table(spark, SF_DIR, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 4, 6), 16, 10
    ).cast("bigint")
    with_u = docs.select("doc_id", u.alias("u"))
    lo = {r["doc_id"] for r in with_u.filter(F.col("u") < 0.3 * 16777216).collect()}
    hi = {r["doc_id"] for r in with_u.filter(F.col("u") < 0.7 * 16777216).collect()}
    assert lo and lo < hi


def test_incremental_dedup_partitions_batch(spark):
    from spark_relieffc_fselection_spark.queries.dedup_q import (
        INCR_MOD,
        INCR_NEW,
    )

    docs = load_table(spark, SF_DIR, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 2, 5), 16, 10
        ).cast("bigint")
        % INCR_MOD
    )
    batch_n = docs.filter(bucket >= INCR_NEW).count()
    rows = q81_incremental_dedup(spark, SF_DIR).collect()
    # statuses partition the batch exactly
    assert sum(r["n_docs"] for r in rows) == batch_n
    statuses = {r["status"] for r in rows}
    assert "new_unique" in statuses
    assert statuses <= {"new_unique", "dup_of_existing", "dup_in_batch"}


def test_filter_funnel_monotone(spark):
    rows = {r["stage"]: r for r in q82_filter_funnel(spark, SF_DIR).collect()}
    assert list(rows) == [0, 1, 2, 3] or set(rows) == {0, 1, 2, 3}
    surv = [rows[i]["n_surviving"] for i in range(4)]
    assert surv[0] >= surv[1] >= surv[2] >= surv[3]
    assert rows[0]["survival_rate"] == 1.0


def test_pii_scrub_removes_every_match(spark):
    out = q83_pii_scrub(spark, SF_DIR)
    # injected PII is present in the counts...
    tot = out.agg(
        *[F.sum(f"n_{k}").alias(k) for k in ("email", "url", "phone", "ipv4")]
    ).first()
    assert all(tot[k] > 0 for k in ("email", "url", "phone", "ipv4"))
    # ...and absent from the scrubbed text, for every pattern class
    leftovers = out.select(
        *[
            F.sum(
                F.size(F.regexp_extract_all("scrubbed_text", F.lit(pat), 0))
            ).alias(name)
            for name, pat in PII_PATTERNS.items()
        ]
    ).first()
    assert all(leftovers[name] == 0 for name in PII_PATTERNS)


def test_doc_chunking_invariants(spark):
    """q91 structural invariants per document: chunk indices are
    0..(n-1)//stride contiguous, starts advance by exactly the stride,
    every chunk holds 1..window tokens, only the last chunk may be
    short, and the last chunk ends exactly at the document's final
    token (full coverage, no over-read)."""
    from spark_relieffc_fselection_spark.queries.trainprep_q import (
        CHUNK_STRIDE,
        CHUNK_TOKS,
        q85_token_truncation,
        q91_doc_chunking,
    )

    chunks = q91_doc_chunking(spark, SF_DIR).collect()
    n_toks = {
        r["doc_id"]: r["n_toks"]
        for r in q85_token_truncation(spark, SF_DIR).collect()
    }
    per_doc: dict = {}
    for r in chunks:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == set(n_toks)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        n = n_toks[doc_id]
        assert [r["chunk_idx"] for r in rows] == list(range((n - 1) // CHUNK_STRIDE + 1))
        for r in rows:
            assert r["start_tok"] == r["chunk_idx"] * CHUNK_STRIDE + 1
            assert 1 <= r["n_toks"] <= CHUNK_TOKS
        for r in rows[:-1]:
            assert r["n_toks"] == min(CHUNK_TOKS, n - r["start_tok"] + 1)
        last = rows[-1]
        assert last["start_tok"] + last["n_toks"] - 1 == n


# --- round-6 additions: MERGE upsert, negative sampling, Zipf fit ------------


def test_merge_upsert_partitions_and_semantics(spark):
    """Action set is exact: every base key not deleted appears once,
    every change-feed upsert key appears once, deletes vanish, and the
    latest version wins."""
    from spark_relieffc_fselection_spark.queries.warehouse_q import (
        q150_merge_upsert,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    base_ids = {r["doc_id"] for r in docs.filter(F.col("doc_id") % 4 != 3).collect()}
    nchars = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    out = {r["doc_id"]: r for r in q150_merge_upsert(spark, SF_DIR).collect()}

    for did, r in out.items():
        changed = did % 3 == 0 or did % 6 == 0
        if not changed:
            assert r["action"] == "keep" and did in base_ids
            assert r["n_chars"] == nchars[did]
        elif did % 6 == 0:
            # v2 upsert overrides any v1 delete; latest version wins
            assert r["action"] == ("update" if did in base_ids else "insert")
            assert r["n_chars"] == nchars[did] + 11
        else:
            assert r["action"] == ("update" if did in base_ids else "insert")
            assert r["n_chars"] == nchars[did] + 7
    # v1 deletes (not overridden by v2) are gone
    deleted = {
        d for d in nchars
        if d % 3 == 0 and d % 5 == 0 and d % 6 != 0
    }
    assert deleted and not (deleted & set(out))
    # every surviving base key is present
    assert base_ids - deleted <= set(out)


def test_negative_sampling_invariants(spark):
    """Negatives are never the anchor, never the anchor's source, at
    most NEG_K per anchor, and deterministic across reruns."""
    from spark_relieffc_fselection_spark.queries.trainprep_q import (
        NEG_K,
        q151_negative_sampling,
    )

    docs = load_table(spark, SF_DIR, "documents")
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    rows = q151_negative_sampling(spark, SF_DIR).collect()
    assert rows
    per_anchor: dict[int, set[int]] = {}
    for r in rows:
        a, n = r["anchor_id"], r["neg_id"]
        assert a % 20 == 0 and n != a
        assert src[n] != src[a]
        assert 0 <= r["neg_slot"] < NEG_K
        per_anchor.setdefault(a, set()).add(r["neg_slot"])
    assert all(len(s) <= NEG_K for s in per_anchor.values())
    again = q151_negative_sampling(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_zipf_fit_slope_negative_and_bounded_plan(spark):
    """Rank-frequency slope is negative (frequency decreases in rank)
    and the head is bounded top-k — the plan must take the
    TakeOrderedAndProject path, not a global vocabulary sort."""
    from spark_relieffc_fselection_spark.queries.text_q import q152_zipf_fit

    df = q152_zipf_fit(spark, SF_DIR)
    row = df.collect()[0]
    assert row["n_terms"] > 10  # sf0.001's synthetic vocab is tiny
    assert row["slope"] < 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bpe_merge_step_rounds(spark):
    """The round-1 winning pair is consumed by the merge: it cannot
    appear among round-2 candidates, and every round is exactly the
    top-BPE_TOP list with dense ranks."""
    from spark_relieffc_fselection_spark.queries.text_q import (
        BPE_TOP,
        q153_bpe_merge_step,
    )

    rows = q153_bpe_merge_step(spark, SF_DIR).collect()
    r1 = sorted((r for r in rows if r["round"] == 1), key=lambda r: r["rank"])
    r2 = sorted((r for r in rows if r["round"] == 2), key=lambda r: r["rank"])
    assert len(r1) == BPE_TOP and len(r2) == BPE_TOP
    assert [r["rank"] for r in r1] == list(range(1, BPE_TOP + 1))
    winner = r1[0]["pair"]
    assert winner not in {r["pair"] for r in r2}
    # counts are non-increasing within a round
    for rs in (r1, r2):
        cs = [r["wcnt"] for r in rs]
        assert cs == sorted(cs, reverse=True)


def test_streaming_upsert_state_is_latest_per_user(spark):
    """Stream-then-merge equals one batch latest-per-key pass (the
    compacted-topic law) — checked directly against a batch window."""
    from pyspark.sql import Window as W

    from spark_relieffc_fselection_spark.queries.quality_q import (
        q154_streaming_upsert_state,
    )

    got = {
        r["user_id"]: (r["last_ts_s"], r["last_event_id"])
        for r in q154_streaming_upsert_state(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {
        r["user_id"]: (r["ts_s"], r["event_id"])
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.unix_timestamp("ts").alias("ts_s"), "event_id")
        .collect()
    }
    assert got == want


def test_bpe_encode_top_tokens(spark):
    """q156 ENCODE properties the oracle hash can't articulate: dense
    ranks, non-increasing counts, distinct surface tokens, and — the
    point of the apply half — at least one MERGED (multi-char) token
    reaching the corpus top list, with every token drawn from the
    corpus character stream (a token's count can never exceed the
    corpus-wide occurrences of its constituent characters)."""
    from spark_relieffc_fselection_spark.queries.text_q import (
        BPE_ENC_TOP,
        q156_bpe_encode,
    )

    df = q156_bpe_encode(spark, SF_DIR)
    rows = sorted(df.collect(), key=lambda r: r["rank"])
    assert len(rows) == BPE_ENC_TOP
    assert [r["rank"] for r in rows] == list(range(1, BPE_ENC_TOP + 1))
    cs = [r["cnt"] for r in rows]
    assert cs == sorted(cs, reverse=True)
    toks = [r["token"] for r in rows]
    assert len(set(toks)) == len(toks)
    assert all(t for t in toks)
    assert any(len(t) >= 2 for t in toks), "no merge survived to the top list"
    # bounded top-k must be a TakeOrdered, not a global sort
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_multiprobe_lsh_recall_dominates_single_probe(spark):
    """q157 vs q73: the Hamming-1 probe set strictly CONTAINS the
    single-probe set, so per-query candidate supersets make recall
    monotonically >= — pinned per query_id, not just on the mean."""
    from spark_relieffc_fselection_spark.queries.relief_q import (
        q73_knn_lsh_recall,
        q157_knn_lsh_multiprobe_recall,
    )

    single = {r["query_id"]: r["n_hits"] for r in q73_knn_lsh_recall(spark, SF_DIR).collect()}
    multi = {r["query_id"]: r["n_hits"] for r in q157_knn_lsh_multiprobe_recall(spark, SF_DIR).collect()}
    assert set(single) == set(multi)
    assert all(multi[q] >= single[q] for q in single)


def test_ann_multiprobe_recall_dominates_single_probe(spark):
    """q159 vs q49: the ANN Hamming-1 probe set strictly contains the
    single-probe candidates, so per-query recall is monotonically >=
    (measured at sf0.01: mean 0.435 -> 0.94)."""
    from spark_relieffc_fselection_spark.queries.simsearch_q import (
        q49_ann_recall,
        q159_ann_lsh_multiprobe_recall,
    )

    single = {r["query_id"]: r["n_hits"] for r in q49_ann_recall(spark, SF_DIR).collect()}
    multi = {r["query_id"]: r["n_hits"] for r in q159_ann_lsh_multiprobe_recall(spark, SF_DIR).collect()}
    assert set(single) == set(multi)
    assert all(multi[q] >= single[q] for q in single)


def test_curation_keep_prebuilt_frames_match_inline(spark):
    """curation_keep's quality/lang parameters (VERDICT r12 #7, the
    _shingles pattern): passing PRE-BUILT cached frames must produce
    exactly the inline keep-set, and the cached plan must stop
    re-inlining the quality/lang subtree (fewer parquet scans)."""
    from spark_relieffc_fselection_spark.operators.textstats import (
        language_id,
        quality_scores,
    )
    from spark_relieffc_fselection_spark.queries.pipeline_q import (
        curation_keep,
    )
    from spark_relieffc_fselection_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    inline = curation_keep(docs)
    q_cached = quality_scores(docs).cache()
    l_cached = language_id(docs).cache()
    try:
        param = curation_keep(docs, quality=q_cached, lang=l_cached)
        assert sorted(map(tuple, inline.collect())) == sorted(
            map(tuple, param.collect())
        )
        # the parameterized plan reads the caches (InMemoryTableScan)
        # instead of re-inlining the quality/lang subtrees; the inline
        # default keeps the declared cache-free plan. (FileScan counts
        # are unusable here: InMemoryRelation's toString embeds its
        # cached child plan, double-counting scans.)
        plan_str = lambda df: df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan_str(param)
        assert "InMemoryTableScan" not in plan_str(inline)
    finally:
        q_cached.unpersist()
        l_cached.unpersist()
