"""Broadcast kNN join (SURVEY §2.3 J1/J2, §2.5 T1).

Reference semantics (ReliefFRSelector.scala:334-369): every partition
scans its local rows against a broadcast query batch computing
``sqrt(sqdist)``, keeps a bounded top-k heap per query
(BoundedPriorityQueue.scala:12-52), then merges heaps across partitions
with ``reduceByKey``.

Spark-first re-expression — the heap + merge is exactly what a
rank-over-window computes, and the per-partition scan is a broadcast
join:

* ``strategy='sql'``: ``instances CROSS JOIN broadcast(queries)`` with a
  ``zip_with``/``aggregate`` distance expression, then
  ``row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id)
  <= k``.  Whole plan is JVM-side codegen; AQE handles the shuffle for
  the window.  Ties are broken deterministically by neighbor id (the
  reference's heap breaks ties arbitrarily — SURVEY §8.3 says goldens
  are partition-locked, so we define our own determinism contract).

* ``strategy='numpy'``: the scale path. Queries are still broadcast,
  but the distance kernel is an Arrow-batched ``mapInPandas`` numpy
  matrix computation (vectorized, ~10-100x a per-row expression for
  wide vectors), emitting only the per-partition top-k candidates
  (the map-side 'heap'), finished by the same global window rank.
  Shuffle volume is O(partitions * queries * k), never O(n * queries).

At 100 TB the queries side stays a bounded sample (the algorithm's
estimationRatio guarantees this — BASELINE.md complexity row), so the
broadcast is small and the scan side is never shuffled.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.functions.vector import euclidean_distance

#: Above this many (instance x query) pairs per partition batch we chunk
#: the numpy distance matrix to bound executor memory.
_MAX_BLOCK_CELLS = 4_000_000

#: ``knn_strategy='auto'`` crossovers, in distance-kernel CELLS
#: (n_queries x n_scan_rows x n_feat — the diff-cube volume one kNN
#: call evaluates). Below _AUTO_GEMM_CELLS the bit-exact diff-cube
#: kernel is sub-second and exactness is free; above it the BLAS
#: expansion's ~10x kernel win (measured 30ms vs 300ms at 500x2000x64)
#: dwarfs its ~1e-13 relative cancellation error. Above _AUTO_LSH_CELLS
#: (~1e12 cells ≈ trillions of FLOPs per fit batch) even BLAS is
#: minutes-scale — candidate generation must go sub-linear, so escalate
#: to multi-table sign-LSH pruning. The reference's headline claim
#: (README.md:15-17: 64M rows x 631 features) lands at ~1e17 cells per
#: fit batch at estimationRatio 0.25 — unreachable by ANY exact scan,
#: which is exactly why 'auto' exists.
_AUTO_GEMM_CELLS = 1 << 25
_AUTO_LSH_CELLS = 1 << 40


def auto_lsh_bits(n_scan: int) -> int:
    """Bucket bits sized to the corpus: ~256 rows per bucket keeps the
    per-query candidate count bounded as N grows. Floor 4 preserves
    recall on small corpora; cap 16 bounds the per-row hashing work."""
    return max(4, min(16, math.ceil(math.log2(max(n_scan, 2) / 256 + 1))))


def auto_lsh_tables(n_scan: int, n_feat: int) -> int:
    """Table count for the APPROXIMATE fit tier: enough tables that the
    sign windows cover every coordinate (tables only ever ADD candidates
    — the cross-table union is deduped — so recall rises monotonically
    with coverage; measured on KAIS XOR100, single-probe: 8 tables ->
    0.578 kNN recall, 25 (full coverage of d=99) -> 0.944; the fit tier
    additionally multiprobes Hamming-1 buckets, which took both KAIS
    fixtures to recall 1.000 — see _candidates_lsh). Capped at 32:
    beyond that the candidate union approaches the full scan and the
    pruning stops paying for its hashing."""
    return min(32, max(8, math.ceil(n_feat / auto_lsh_bits(n_scan))))


def resolve_auto_strategy(n_queries: int, n_scan: int, n_feat: int) -> str:
    """Pick the cheapest kNN strategy whose cost model fits the job.

    Escalation: ``numpy`` (bit-exact diff cube) -> ``numpy-gemm`` (BLAS
    expansion, exact ranks on integer grids, ~1e-13 relative error
    otherwise) -> ``lsh`` (approximate sub-linear candidates). The
    caller supplies the three cardinalities — they are knowable without
    extra jobs wherever the fit already profiled the data (fit_relief
    knows sampled_size, n_batches and n_feat from its one profiling
    pass)."""
    cells = max(n_queries, 1) * max(n_scan, 1) * max(n_feat, 1)
    if cells <= _AUTO_GEMM_CELLS:
        return "numpy"
    if cells <= _AUTO_LSH_CELLS:
        return "numpy-gemm"
    return "lsh"


def knn_join(
    instances: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "id",
    features_col: str = "features",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    strategy: str = "sql",
    num_instances: int | None = None,
    lsh_bits: int | None = None,
    lsh_tables: int = 8,
    lsh_multiprobe: bool = False,
    lsh_probe_radius: int = 1,
    scan_partitions: int | None = None,
    num_queries: int | None = None,
) -> DataFrame:
    """k nearest neighbors of each query among ``instances``.

    Returns ``(query_id, neighbor_id, distance, rank)`` with
    ``rank`` in 1..k ordered by (distance, neighbor_id).

    The approximate tier's RECALL CONTRACT (strategy='lsh'): candidates
    are the union over ``lsh_tables`` sign-hash tables of same-bucket
    rows, optionally multiprobed to every bucket within Hamming
    distance ``lsh_probe_radius`` of the query's bucket
    (``lsh_multiprobe=True``). Each extra table or probe only ADDS
    candidates (the union is deduped), so recall is monotone
    non-decreasing in both knobs — measured on the continuous
    1e6 x 32 regime: ~0.70 at auto-sized tables with Hamming-1, with
    radius 2 buying the next recall step at ~(n_bits^2)/2 more probe
    rows per query-table (broadcast-side only; zero extra scan work).
    When the default tier's recall is not enough, raise
    ``lsh_probe_radius`` to 2 first (cheapest), then ``lsh_tables``.

    ``exclude_self`` drops pairs with equal ids: the reference includes
    the query itself as a zero-distance neighbor (ReliefFRSelector.scala:
    344-363 scans every local row), which is an artifact, not intent —
    classic RELIEF-F neighborhoods exclude the instance. Pass False to
    reproduce the reference's behavior.
    """
    # Small files arrive as one partition; spread the scan side or the
    # kernel runs on one core. But every extra partition adds k
    # candidate rows per query to the rank-merge shuffle, so cap at
    # ~256 scan rows per partition. (At real scale the input already
    # has >= parallelism partitions; this is a no-op.)
    #
    # ``scan_partitions``: the .rdd conversion below forces a full
    # plan analysis on the driver per call; inside fit_relief's batch
    # loop that is one extra driver round-trip per batch, and the batch
    # partitioning is knowable once up front (filter/randomSplit are
    # narrow — they preserve the parent's partition count). Callers in
    # a loop pass it; one-shot callers let us derive it.
    sc = instances.sparkSession.sparkContext
    n_parts = (
        scan_partitions
        if scan_partitions is not None
        else instances.rdd.getNumPartitions()
    )
    if n_parts < sc.defaultParallelism:
        # `num_instances` (when the caller already knows it) saves a
        # count() job on the scan side.
        approx_rows = num_instances if num_instances is not None else instances.count()
        target = max(1, min(sc.defaultParallelism, approx_rows // 256))
        if target > n_parts:
            instances = instances.repartition(target)

    if strategy == "lsh":
        cand = _candidates_lsh(
            instances,
            queries,
            id_col,
            features_col,
            query_id_col,
            n_bits=lsh_bits,
            n_tables=lsh_tables,
            num_instances=num_instances,
            multiprobe=lsh_multiprobe,
            probe_radius=lsh_probe_radius,
            num_queries=num_queries,
        )
        if exclude_self:
            cand = cand.filter(F.col(query_id_col) != F.col("neighbor_id"))
    elif strategy in ("numpy", "numpy-gemm"):
        # Self-exclusion happens inside the kernel: the per-partition
        # candidate set is already truncated to k, so filtering after
        # the fact would leave k-1 neighbors for self-containing
        # partitions.
        cand = _candidates_numpy(
            instances,
            queries,
            k,
            id_col,
            features_col,
            query_id_col,
            exclude_self,
            gemm=(strategy == "numpy-gemm"),
        )
    else:
        cand = _candidates_sql(instances, queries, id_col, features_col, query_id_col)
        if exclude_self:
            cand = cand.filter(F.col(query_id_col) != F.col("neighbor_id"))

    w = Window.partitionBy(query_id_col).orderBy(F.col("distance").asc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _candidates_sql(
    instances: DataFrame,
    queries: DataFrame,
    id_col: str,
    features_col: str,
    query_id_col: str,
) -> DataFrame:
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(features_col).alias("_q_features"),
    )
    inst = instances.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(features_col).alias("_n_features"),
    )
    return (
        inst.crossJoin(F.broadcast(q))
        .select(
            query_id_col,
            "neighbor_id",
            euclidean_distance("_q_features", "_n_features").alias("distance"),
        )
    )


def _candidates_lsh(
    instances: DataFrame,
    queries: DataFrame,
    id_col: str,
    features_col: str,
    query_id_col: str,
    n_bits: int | None = None,
    n_tables: int = 8,
    num_instances: int | None = None,
    multiprobe: bool = False,
    probe_radius: int = 1,
    num_queries: int | None = None,
) -> DataFrame:
    """APPROXIMATE candidate generation: multi-table sign-LSH buckets
    (reusing the ANN machinery, simsearch._with_table_buckets) prune
    the scan to same-bucket pairs, then exact Euclidean distance ranks
    the candidates. Per-query scan cost ~ n_tables * n / 2^n_bits
    instead of n — the sub-linear pre-filter SURVEY §7.3 calls for at
    100 TB ("optional LSH approximate kNN"). Deterministic (buckets
    are coordinate-sign patterns), but candidates can miss true
    neighbors: this is the approximate scale path, never the
    oracle-gated default.

    ``multiprobe``: Hamming-1 multiprobe (Lv et al., VLDB'07 shape) —
    each QUERY also probes the n_bits buckets one sign-flip away, so a
    pair becomes a candidate when some table window disagrees in at
    most one coordinate sign instead of none. The expansion is on the
    broadcast (query) side only: broadcast rows x(1+n_bits), zero extra
    scan-side work. Measured on the KAIS fixtures (auto-sized buckets):
    kNN recall 0.964 -> 1.000 (XOR100, d=99), 0.729 -> 1.000 (Corral,
    d=6). The RELIEF fit escalation tier turns this ON — RELIEF weights
    are exactly as good as the neighborhoods, and planted-signal
    selection (XOR) demonstrably does not survive the ~4-27% neighbor
    loss of single-probe."""
    from spark_relieffc_fselection_spark.operators.simsearch import (
        _with_table_buckets,
    )

    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(features_col).alias("_q_features"),
    )
    inst = instances.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(features_col).alias("_n_features"),
    )
    if n_bits is None:
        # Auto-size buckets to the corpus (fixed n_bits would make
        # candidates ~ N/2^bits — still linear in N, i.e. quadratic
        # total).
        n = num_instances if num_instances is not None else instances.count()
        n_bits = auto_lsh_bits(n)
    if probe_radius not in (1, 2):
        raise ValueError(f"probe_radius must be 1 or 2, got {probe_radius}")
    q_b = _with_table_buckets(q, "_q_features", n_bits, n_tables)
    n_probes = 1
    if multiprobe:
        # Probe set: the bucket itself plus every bucket within Hamming
        # distance `probe_radius` (Lv et al., VLDB'07 shape) — each
        # single-bit flip, and at radius 2 each two-bit flip as well
        # (the escalation knob when radius-1 recall isn't enough:
        # candidates only grow, so recall is monotone in the radius).
        # explode() multiplies only the broadcast side; the downstream
        # pair-distinct absorbs cross-probe duplicates.
        masks = [1 << i for i in range(n_bits)]
        if probe_radius >= 2:
            masks += [
                (1 << i) | (1 << j)
                for i in range(n_bits)
                for j in range(i + 1, n_bits)
            ]
        n_probes = 1 + len(masks)
        q_b = q_b.withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(m).cast("bigint"))
                        for m in masks
                    ],
                )
            ),
        )
    i_b = _with_table_buckets(inst, "_n_features", n_bits, n_tables)
    # Broadcast the probe table only when it is provably small: at the
    # fit's escalation scale (batch == queries, 32 tables x 17 probes)
    # the probe table is ~544 rows PER QUERY — a 400k-row batch would
    # be a multi-GB broadcast, while a plain shuffle join on
    # (table, bucket) is linear in both sides and AQE still converts
    # it back to broadcast at runtime if the built side turns out
    # tiny. Callers that know the query count pass it; unknown counts
    # keep the hint (the q73/q157-style bounded-query case).
    probe_rows = (
        num_queries * n_tables * n_probes if num_queries is not None else None
    )
    probe_tbl = q_b.select("table", "bucket", query_id_col)
    if probe_rows is None or probe_rows <= 4_000_000:
        probe_tbl = F.broadcast(probe_tbl)
    # distinct BEFORE the distance — a pair colliding in several tables
    # must be scored once — and over BARE ID PAIRS: deduping rows that
    # carry the two d-dim arrays shuffles ~d x 16 bytes per candidate
    # (measured 4x slower at d=64); the features re-join afterwards
    # costs one broadcast (queries) + one co-partitionable hash join
    # (instances), and the distance collapses to a scalar before the
    # rank shuffle.
    pairs = (
        i_b.join(probe_tbl, ["table", "bucket"])
        .select(query_id_col, "neighbor_id")
        .distinct()
    )
    # The features side of the query broadcast IS bounded by the fit's
    # broadcast-memory guard (rows x (nFeat+2) doubles < ~2 GiB — the
    # same bound the reference places on its batch broadcast), so the
    # hint stays unconditional here.
    return (
        pairs.join(F.broadcast(q), query_id_col)
        .join(inst, "neighbor_id")
        .select(
            query_id_col,
            "neighbor_id",
            euclidean_distance("_q_features", "_n_features").alias("distance"),
        )
    )


def _candidates_numpy(
    instances: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    features_col: str,
    query_id_col: str,
    exclude_self: bool,
    gemm: bool = False,
) -> DataFrame:
    """Arrow-batched blockwise scan emitting per-partition top-k.

    ``gemm=False`` (default): direct ``(q-b)^2`` diff cube — bit-exact
    against the SQL fold under any input, hence safe for oracle-gated
    rank comparisons.

    ``gemm=True``: the ``|q|^2 - 2 q.b + |b|^2`` expansion via a BLAS
    matmul — ~10x faster (measured 30ms vs 300ms for 500x2000x64) and
    the 100 TB scale path, where the kernel dominates wall time. Its
    cancellation error (~1e-13 relative) can flip ranks between
    *near-tied distinct* distances, so use it where that is impossible
    or immaterial: integer-valued coordinates (products and sums are
    exact in float64 — identical ranks guaranteed, e.g. discretized
    features) or approximate/scale paths not gated on exact ranks.
    Exact-duplicate pairs clamp to distance 0 via ``maximum(d2, 0)``.
    """
    spark = instances.sparkSession
    qrows = queries.select(id_col, features_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)  # (Q, d)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    out_schema = f"{query_id_col} long, neighbor_id long, distance double"

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        nq = len(ids)
        if nq == 0:
            return
        d = mat.shape[1] if mat.ndim == 2 else 1
        # Running per-partition candidates: keep at most k per query.
        best_d = np.full((nq, k), np.inf)
        best_i = np.full((nq, k), -1, dtype=np.int64)
        # Chunk so the intermediate stays bounded: the diff cube is
        # (Q, B, d) cells, but gemm's intermediates (q.n^T and d2) are
        # only (Q, B) — its chunks can be d times larger, which also
        # divides the per-chunk top-k merge overhead by d.
        chunk = max(1, _MAX_BLOCK_CELLS // max(nq * (1 if gemm else d), 1))
        qq = np.einsum("qd,qd->q", mat, mat) if gemm else None
        for pdf in batches:
            n_ids_all = pdf[id_col].to_numpy(dtype=np.int64)
            n_mat_all = np.array(list(pdf[features_col]), dtype=np.float64)
            for s in range(0, len(n_ids_all), chunk):
                n_ids = n_ids_all[s : s + chunk]
                n_mat = n_mat_all[s : s + chunk]
                if gemm:
                    nn = np.einsum("bd,bd->b", n_mat, n_mat)
                    d2 = qq[:, None] - 2.0 * (mat @ n_mat.T) + nn[None, :]
                    np.maximum(d2, 0.0, out=d2)
                else:
                    diff = mat[:, None, :] - n_mat[None, :, :]
                    d2 = np.einsum("qbd,qbd->qb", diff, diff)
                if exclude_self:
                    d2[ids[:, None] == n_ids[None, :]] = np.inf
                merged_d = np.concatenate([best_d, d2], axis=1)
                merged_i = np.concatenate(
                    [best_i, np.broadcast_to(n_ids, (nq, len(n_ids)))], axis=1
                )
                # Deterministic truncation by (distance, neighbor_id):
                # argpartition alone keeps an ARBITRARY subset among
                # distances tied at the k boundary, so a tied lower-id
                # neighbor could be dropped in-partition and never
                # recovered by the global window rank. lexsort's last
                # key is primary -> sort by distance, then id.
                order = np.lexsort((merged_i, merged_d), axis=1)
                sel = order[:, :k]
                rows = np.arange(nq)[:, None]
                best_d = merged_d[rows, sel]
                best_i = merged_i[rows, sel]
        # isfinite: self-pairs are masked with inf distance but keep a
        # valid id — they must not leak out as rank-k "neighbors" when a
        # partition has fewer than k rows.
        valid = (best_i >= 0) & np.isfinite(best_d)
        qi, slot = np.nonzero(valid)
        yield pd.DataFrame(
            {
                query_id_col: ids[qi],
                "neighbor_id": best_i[qi, slot],
                "distance": np.sqrt(best_d[qi, slot]),
            }
        )

    return instances.select(id_col, features_col).mapInPandas(scan, schema=out_schema)
