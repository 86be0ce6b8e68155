"""Source/ingest parity tests (SURVEY §2.1 S1/S2, §2.7 F7/F10/F11,
TestHelper.scala:41-113 equivalents): CSV with schema + inferSchema,
raw text, null-label cleaning, StringIndexer + VectorAssembler wiring."""

import pytest
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.sources import load_table, read_csv, read_text


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    p = d / "data.csv"
    p.write_text("class,v1,v2\na,1.5,2\nb,0.5,4\n,2.5,6\na,3.5,8\n")
    return str(p)


def test_csv_infer_schema(spark, csv_file):
    df = read_csv(spark, csv_file)
    assert dict(df.dtypes)["v1"] == "double"
    assert df.count() == 4


def test_csv_explicit_schema(spark, csv_file):
    df = read_csv(spark, csv_file, schema="class string, v1 double, v2 int")
    assert dict(df.dtypes) == {"class": "string", "v1": "double", "v2": "int"}


def test_read_text(spark, csv_file):
    assert read_text(spark, csv_file).count() == 5  # header + 4 rows


def test_null_label_cleaning_pipeline(spark, csv_file):
    """TestHelper.scala:91-113: null labels -> sentinel, StringIndexer,
    VectorAssembler — the reference's full ingest path."""
    df = read_csv(spark, csv_file)
    cleaned = df.withColumn(
        "class",
        F.when(F.col("class").isNull(), F.lit("__MISSING__")).otherwise(F.col("class")),
    )
    indexed = StringIndexer(inputCol="class", outputCol="label").fit(cleaned).transform(cleaned)
    assembled = VectorAssembler(inputCols=["v1", "v2"], outputCol="features").transform(indexed)
    rows = assembled.select("label", "features").collect()
    assert len(rows) == 4
    assert all(r["features"].size == 2 for r in rows)
    assert len({r["label"] for r in rows}) == 3  # a, b, __MISSING__


def test_parquet_sink_roundtrip(spark, tmp_path_factory):
    """S3/S4: write a query result as parquet, read it back intact."""
    d = str(tmp_path_factory.mktemp("sink") / "out.parquet")
    src = load_table(spark, "/root/testdata/sf0.001", "nation")
    src.write.mode("overwrite").parquet(d)
    back = spark.read.parquet(d)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_load_table_events_timestamps(spark):
    """Nanos-timestamp handling: ts must come back as a usable
    timestamp column."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.filter(F.col("ts") >= "2024-01-01").count() == ev.count()


def test_json_source(spark, tmp_path_factory):
    from spark_relieffc_fselection_spark.sources import read_json

    d = tmp_path_factory.mktemp("json")
    p = d / "rows.jsonl"
    p.write_text('{"id": 1, "v": 1.5}\n{"id": 2, "v": null}\n')
    df = read_json(spark, str(p), schema="id long, v double")
    rows = {r["id"]: r["v"] for r in df.collect()}
    assert rows == {1: 1.5, 2: None}


def test_partitioned_sink_prunes(spark, tmp_path_factory):
    """Partitioned parquet write; a filter on the partition column must
    become a PartitionFilter (pruned listing), not a data filter."""
    from spark_relieffc_fselection_spark.sources import write_partitioned_parquet

    d = str(tmp_path_factory.mktemp("psink") / "events")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    write_partitioned_parquet(ev, d, ["event_type"])

    back = spark.read.parquet(d).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan
    expected = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == expected


def test_orc_sink_roundtrip(spark, tmp_path_factory):
    """ORC source/sink (Spark-native columnar alternative to parquet):
    a query result written as ORC reads back value-identical. No DuckDB
    oracle exists for ORC, so this is test-pinned (SURVEY S3/S4 family)."""
    d = str(tmp_path_factory.mktemp("orc_sink") / "t.orc")
    src = load_table(spark, "/root/testdata/sf0.001", "nation")
    src.write.mode("overwrite").orc(d)
    back = spark.read.orc(d)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    # predicate pushdown reaches the ORC scan
    plan = (
        back.filter("n_regionkey = 1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "n_regionkey" in plan


def test_csv_sink_roundtrip(spark, tmp_path_factory):
    """CSV sink round-trip with explicit schema on re-read."""
    d = str(tmp_path_factory.mktemp("csv_sink") / "t.csv")
    src = load_table(spark, "/root/testdata/sf0.001", "region").select(
        "r_regionkey", "r_name"
    )
    src.write.mode("overwrite").option("header", "true").csv(d)
    back = read_csv(spark, d, schema="r_regionkey long, r_name string")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_read_labeled_csv_reference_conventions(spark):
    """read_labeled_csv ingests both reference dataset layouts — class-
    first microarray CSV (with pad) and class-last KAIS CSV — and feeds
    the estimator directly (end-to-end: XOR100's planted feature 4 must
    top the selection)."""
    import pytest as _pytest
    from pathlib import Path

    from spark_relieffc_fselection_spark.sources import read_labeled_csv

    data = Path("/root/reference/src/test/resources/data")
    if not data.exists():
        _pytest.skip("reference datasets not present")

    lung = read_labeled_csv(
        spark, str(data / "test_lung_s3.csv"), label_position="first", pad=2.0
    )
    row = lung.first()
    assert len(row["features"]) == 325
    assert min(min(r["features"]) for r in lung.collect()) >= 0.0  # padded

    xor = read_labeled_csv(
        spark,
        str(data / "DatasetsKAIS" / "XOR100.csv"),
        label_position="last",
        header=False,
    )
    assert len(xor.first()["features"]) == 99

    from spark_relieffc_fselection_spark.ml import ReliefFSelector

    model = ReliefFSelector(
        numTopFeatures=2, numNeighbors=5, estimationRatio=1.0, batchSize=1.0,
        discreteData=True, seed=1,
    ).fit(xor)
    assert 4 in model.getOrDefault(model.stdSelection)


def test_read_libsvm_feeds_sparse_estimator(spark, tmp_path_factory):
    """LibSVM ingest (the reference's kddb-scale format) produces
    SparseVectors that route through the estimator's inverted-index
    path end-to-end."""
    import numpy as np

    from spark_relieffc_fselection_spark.ml import ReliefFSelector
    from spark_relieffc_fselection_spark.sources import read_libsvm

    rng = np.random.default_rng(17)
    d = 12
    path = tmp_path_factory.mktemp("libsvm") / "part.txt"
    lines = []
    for i in range(60):
        informative = rng.integers(0, 2)
        label = informative
        feats = {3: float(informative * 2 + 1)}  # feature idx 3 decides
        for j in rng.choice(d, size=4, replace=False):
            feats.setdefault(int(j), float(rng.integers(1, 4)))
        kv = " ".join(f"{k + 1}:{v}" for k, v in sorted(feats.items()))
        lines.append(f"{label} {kv}")
    path.write_text("\n".join(lines))

    df = read_libsvm(spark, str(path), num_features=d)
    assert df.schema["features"].dataType.typeName() == "vectorudt"
    model = ReliefFSelector(
        numTopFeatures=2, numNeighbors=3, estimationRatio=1.0, batchSize=1.0,
        discreteData=True, seed=3,
    ).fit(df)
    assert 3 in model.getOrDefault(model.stdSelection)


def test_epoch_shuffle_roundtrip(spark, tmp_path):
    from spark_relieffc_fselection_spark.sources import (
        load_table,
        read_epoch_shuffle,
        write_epoch_shuffle,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "shuffled")
    write_epoch_shuffle(docs.select("doc_id", "n_chars"), out, "doc_id", n_shards=8)

    back = read_epoch_shuffle(spark, out)
    # lossless: every doc exactly once
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }
    # layout: hive shard dirs exist, and within each shard the stored
    # row order is ascending sort_key (the reader relies on file order)
    import os

    shards = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert 1 < len(shards) <= 8
    for d in shards:
        rows = spark.read.parquet(os.path.join(out, d)).collect()
        keys = [r["sort_key"] for r in rows]
        assert keys == sorted(keys)
    # determinism: same keys -> same permutation
    out2 = str(tmp_path / "shuffled2")
    write_epoch_shuffle(docs.select("doc_id", "n_chars"), out2, "doc_id", n_shards=8)
    a = [r["doc_id"] for r in read_epoch_shuffle(spark, out).collect()]
    b = [r["doc_id"] for r in read_epoch_shuffle(spark, out2).collect()]
    assert a == b


def test_write_sized_parquet_controls_file_count(spark, tmp_path):
    from spark_relieffc_fselection_spark.sources import write_sized_parquet

    df = spark.range(1000).repartition(64)  # 64 near-empty partitions
    out = str(tmp_path / "sized")
    n_files = write_sized_parquet(df, out, target_rows_per_file=300)
    assert n_files == 4
    import glob

    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 4
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.rdd.getNumPartitions() <= 8  # read compact, not 64-way


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC sink + scan: values survive the round trip and the scan
    gets predicate pushdown + column pruning like parquet."""
    from pyspark.sql import functions as F

    from spark_relieffc_fselection_spark.sources import read_orc, write_orc

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_orc")
    write_orc(docs.select("doc_id", "source", "n_chars"), out)

    back = read_orc(spark, out, columns=["doc_id", "n_chars"])
    assert back.count() == docs.count()
    assert back.columns == ["doc_id", "n_chars"]

    filt = read_orc(spark, out).filter(F.col("n_chars") > 500)
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "n_chars" in plan
    a = sorted(r["doc_id"] for r in filt.collect())
    b = sorted(
        r["doc_id"]
        for r in docs.filter(F.col("n_chars") > 500).collect()
    )
    assert a == b


def test_write_zordered_files_disjoint_and_tight(spark, tmp_path):
    from spark_relieffc_fselection_spark.functions.partitioning import morton16
    from spark_relieffc_fselection_spark.sources import write_zordered

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    keyed = orders.select(
        (F.col("o_custkey") % 256).alias("x"),
        (F.floor(F.col("o_totalprice") / 500.0).cast("bigint") % 256).alias("y"),
    )
    out = str(tmp_path / "zordered")
    write_zordered(keyed, out, "x", "y", n_files=8)

    back = spark.read.parquet(out).select(
        "x", "y",
        morton16(F.col("x"), F.col("y")).alias("z"),
        F.input_file_name().alias("f"),
    )
    stats = back.groupBy("f").agg(
        F.min("z").alias("zmin"), F.max("z").alias("zmax"),
        (F.max("x") - F.min("x")).alias("xspan"),
        (F.max("y") - F.min("y")).alias("yspan"),
    ).collect()
    assert len(stats) >= 2
    # files cover disjoint z-ranges (range partitioning + in-file sort)
    spans = sorted((r["zmin"], r["zmax"]) for r in stats)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo
    # per-file min/max is tight on BOTH dims vs the global 0..255 span
    mean_span = sum(r["xspan"] + r["yspan"] for r in stats) / (2 * len(stats))
    assert mean_span < 200  # random layout would sit at ~255 per dim


def test_write_zordered_preserves_rows(spark, tmp_path):
    from spark_relieffc_fselection_spark.sources import write_zordered

    df = spark.range(1000).select(
        (F.col("id") % 64).alias("x"), ((F.col("id") * 7) % 64).alias("y")
    )
    out = str(tmp_path / "z2")
    write_zordered(df, out, "x", "y", n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert set(back.columns) == {"x", "y"}


def test_write_bucketed_roundtrip_and_colocation(spark, tmp_path):
    """write_bucketed: values identical to the source, and a same-key
    join of two co-bucketed tables plans with no exchange on either
    join input."""
    from pyspark.sql import functions as F

    from spark_relieffc_fselection_spark.sources import write_bucketed

    a = spark.createDataFrame(
        [(i, float(i) * 1.5) for i in range(100)], "k long, v double"
    )
    b = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(0, 100, 2)], "k long, g string"
    )
    write_bucketed(a, "tb_a", ["k"], 4, sort_cols=["k"],
                   path=str(tmp_path / "a"))
    write_bucketed(b, "tb_b", ["k"], 4, sort_cols=["k"],
                   path=str(tmp_path / "b"))
    ta, tb = spark.table("tb_a"), spark.table("tb_b")
    j = ta.hint("merge").join(tb, "k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {(r.k, r.v, r.g) for r in j.collect()}
    want = {(i, i * 1.5, "g%d" % (i % 3)) for i in range(0, 100, 2)}
    assert got == want
    spark.sql("DROP TABLE tb_a")
    spark.sql("DROP TABLE tb_b")


def test_read_parquet_merged_surfaces_new_column_as_null(spark, tmp_path):
    from pyspark.sql import functions as F

    from spark_relieffc_fselection_spark.sources import read_parquet_merged

    # epoch=N naming: partition discovery is what makes Spark recurse
    # into the per-epoch subdirectories (bare names aren't indexed)
    spark.createDataFrame(
        [(1, 10), (2, 20)], "id long, a long"
    ).write.parquet(str(tmp_path / "epoch=0"))
    spark.createDataFrame(
        [(3, 30, "x")], "id long, a long, b string"
    ).write.parquet(str(tmp_path / "epoch=1"))
    got = {
        r.id: (r.a, r.b)
        for r in read_parquet_merged(spark, str(tmp_path)).collect()
    }
    assert got == {1: (10, None), 2: (20, None), 3: (30, "x")}
    # pushdown still reaches the scan for columns present everywhere
    plan = (
        read_parquet_merged(spark, str(tmp_path))
        .filter(F.col("a") > 15)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(a), GreaterThan(a,15)]" in plan, plan
