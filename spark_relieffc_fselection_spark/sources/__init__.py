"""Sources & sinks (SURVEY §2.1 S1-S6).

The reference reads CSV/text via Spark 2.2 APIs (TestHelper.scala:
127-152) and persists models as params-JSON + parquet
(ReliefFRSelector.scala:854-881). Here every source is a DataFrame
reader so Catalyst gets pushdown/pruning for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one testdata table (S4-analogue).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
    rejects by default; read it as raw nanos and truncate to micros
    (exactly what DuckDB's reader does), so both engines see the same
    instants.
    """
    # Timestamp literals in queries parse in the session timezone; the
    # oracles compare naive-as-UTC. Pin it for externally-created
    # sessions (the driver's) too.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division: double division loses ns precision above
            # 2^53 (epoch nanos ~1.7e18) and can land on the wrong micro
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Parquet writers vary isAdjustedToUTC; with the session tz
            # pinned to UTC above, NTZ and LTZ denote the same instant —
            # normalize so every consumer sees one timestamp type.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TPCH_TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the testdata star schema to spark.sql(...)."""
    for t in TPCH_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan (S1/S2): explicit schema when known, inferSchema as the
    test-harness fallback (TestHelper.scala:127-134)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_labeled_csv(
    spark: SparkSession,
    path: str,
    label_col: str | None = None,
    label_position: str = "first",
    feature_cols: Sequence[str] | None = None,
    pad: float = 0.0,
    header: bool = True,
) -> DataFrame:
    """Labeled-dataset CSV ingest: the reference harness's path
    (TestHelper.scala:35-74 readCSVData -> VectorAssembler -> padded
    features) as ONE distributed read returning ``(features
    array<double>, label double)`` — feed it straight to
    ``ReliefFSelector`` (which attaches its own row ids, SURVEY P2) or
    ``fit_relief``.

    ``label_col`` names the class column; otherwise ``label_position``
    picks ``'first'`` (microarray convention: test_lung_s3.csv) or
    ``'last'`` (KAIS synthetic convention, DatasetsKAIS/readme).
    ``pad`` shifts every feature value (the reference's `padded`
    argument for negative discrete levels)."""
    df = read_csv(spark, path, header=header)
    if label_col is None:
        label_col = df.columns[0] if label_position == "first" else df.columns[-1]
    if feature_cols is None:
        feature_cols = [c for c in df.columns if c != label_col]
    feats = F.array(*[F.col(c).cast("double") + F.lit(pad) for c in feature_cols])
    return df.select(
        feats.alias("features"), F.col(label_col).cast("double").alias("label")
    )


def read_libsvm(
    spark: SparkSession, path: str, num_features: int | None = None
) -> DataFrame:
    """LibSVM scan -> (label double, features SparseVector) — the format
    of the reference's flagship sparse workloads (kddb, 20M x 30M,
    README.md:18). Pass ``num_features`` in production: without it the
    source runs an extra pass to determine dimensionality. The sparse
    vectors feed ``ReliefFSelector`` directly (the estimator routes
    SparseVector input through the inverted-index path — never
    densified)."""
    reader = spark.read.format("libsvm")
    if num_features is not None:
        reader = reader.option("numFeatures", str(num_features))
    return reader.load(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw text scan (S2 fallback, TestHelper.scala:138-152)."""
    return spark.read.text(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """JSON-lines scan. Always pass a schema in production: schema
    inference reads the data twice and types drift across files."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(
    spark: SparkSession, path: str, columns: Sequence[str] | None = None
) -> DataFrame:
    """ORC scan (columnar alternative interchange format; same
    vectorized reader, predicate pushdown, and column pruning
    machinery as parquet — Hive-ecosystem corpora commonly arrive as
    ORC). Pass ``columns`` to prune at the scan."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns is not None else df


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (snappy by default, same as the parquet sinks)."""
    df.write.mode(mode).orc(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet sink.

    At 100 TB, partitioning by a low-cardinality filter column (date,
    source, language) is what turns full scans into partition-pruned
    reads — Catalyst pushes `WHERE partition_col = x` into the file
    listing itself (`PartitionFilters` in the scan node), so unmatched
    partitions are never opened. Keep partition cardinality ≤ ~10^4:
    each partition is a directory, and tiny-file explosion costs more
    than pruning saves.
    """
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_epoch_shuffle(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 64,
    mode: str = "overwrite",
) -> None:
    """Epoch-shuffle sink: materialize a deterministic global
    permutation of ``df`` WITHOUT a global sort (the q79 layout).

    Each row gets ``sort_key = md5(key_col)`` and
    ``shard = prefix(sort_key) mod n_shards``; the write is
    ``repartition(shard) + sortWithinPartitions(sort_key)`` under
    ``partitionBy(shard)``. A training reader that streams shards
    0..n-1, each file in stored (ascending-key) order, observes a
    uniform pseudo-random document order — and every shard is an
    independent write task, so the layout costs ONE narrow shuffle at
    any corpus size where a global ``orderBy`` would funnel 100 TB
    through a single range-sort stage.

    Deterministic: same keys => same permutation, any cluster size.
    """
    from pyspark.sql import functions as F

    sort_key = F.md5(F.col(key_col).cast("string"))
    shard = F.conv(F.substring(sort_key, 1, 4), 16, 10).cast("bigint") % n_shards
    (
        df.withColumn("sort_key", sort_key)
        .withColumn("shard", shard)
        .repartition(n_shards, "shard")
        # (shard, sort_key), not sort_key alone: the dynamic-partition
        # writer re-sorts each task by its partition columns when rows
        # aren't already clustered by them, and that re-sort is not
        # stable — leading with shard satisfies the writer's required
        # ordering so the key order inside each file survives.
        .sortWithinPartitions("shard", "sort_key")
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )


def read_epoch_shuffle(spark: SparkSession, path: str) -> DataFrame:
    """Read an epoch-shuffle layout back in permutation order: shards
    ascending, keys ascending within each shard. The sort here is
    per-partition metadata order, not a cluster-wide shuffle — files
    are already stored sorted."""
    return spark.read.parquet(path).sortWithinPartitions("shard", "sort_key")


def write_sized_parquet(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    approx_rows: int | None = None,
    mode: str = "overwrite",
) -> int:
    """Parquet sink that controls OUTPUT FILE COUNT — the small-file
    guard every 100 TB pipeline needs: a filter-heavy stage upstream
    leaves thousands of near-empty partitions, and writing them 1:1
    floods the table with KB-sized files that tax every later file
    listing and scan. One repartition to ceil(rows / target) files.

    ``approx_rows`` (when the caller already knows it) skips the
    count job. Round-robin repartition (no keys) gives uniform file
    sizes regardless of upstream skew. Returns the file count used.
    """
    n = approx_rows if approx_rows is not None else df.count()
    n_files = max(1, -(-n // max(1, target_rows_per_file)))
    df.repartition(n_files).write.mode(mode).parquet(path)
    return n_files


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int,
    mode: str = "overwrite",
    keep_key: bool = False,
) -> None:
    """Z-ordered parquet sink (the Delta/Iceberg OPTIMIZE ZORDER BY
    shape): interleave two integer dimensions into a Morton key
    (functions/partitioning.morton16), range-partition by the key for
    balanced files, and store each file key-sorted.

    Result: every file covers a CONTIGUOUS, disjoint z-range, so its
    parquet min/max statistics are tight on BOTH source dimensions —
    scans filtering on either one skip most files/row-groups, where a
    single-column sort would only prune on that column. Callers
    pre-bucket the dimensions into 0..65535 ints (q118 shows the
    bucketing idiom).

    The layout costs one sampled range exchange (`repartitionByRange`)
    + per-task sorts — no global sort stage, so it holds at any
    corpus size; rewriting layout is exactly what table-format
    OPTIMIZE jobs do offline.
    """
    from spark_relieffc_fselection_spark.functions.partitioning import morton16

    keyed = df.withColumn("_zkey", morton16(F.col(x_col), F.col(y_col)))
    out = (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
    )
    if not keep_key:
        out = out.drop("_zkey")
    out.write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table sink (``bucketBy`` + ``saveAsTable`` —
    Spark's native bucketing needs a catalog table, no Hive required).

    THE pre-shuffle for repeated large-large joins: rows hash into
    ``n_buckets`` files by ``bucket_cols`` at WRITE time, so any later
    equi-join or aggregation on those keys between two tables bucketed
    with the same count satisfies the join's distribution requirement
    straight off the scan — zero Exchange in the plan (pinned by
    tests/test_plans.py). At 100 TB this turns the nightly
    fact-to-fact join from a full two-sided shuffle into a co-located
    file-to-file merge; ``sort_cols`` additionally stores each bucket
    file sorted. The snapshot stores of q116/q119 are the intended
    users (scd.py's "disappears when bucketed by key" note).

    ``path`` makes the table external (data at ``path``, metadata in
    the session catalog); without it data lands in the session
    warehouse dir.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Directory read with parquet schema merging: files written at
    different pipeline epochs may carry different (compatible)
    schemas — a column added in epoch N must not break reading epochs
    < N, whose rows surface it as NULL.

    ``mergeSchema`` unions the footers at planning time (one footer
    read per file — at 100 TB prefer per-directory epoch manifests,
    but the semantics are this). The scan stays a single parquet
    relation: pushdown and pruning still apply to columns present in
    each file. Lay epochs out as ``epoch=N/`` subdirectories —
    partition discovery is what makes the file index recurse, and the
    epoch arrives as a (prunable) partition column for free.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)
