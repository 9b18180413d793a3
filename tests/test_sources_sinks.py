"""Source/sink round-trips: parquet (partitioned), CSV, JSON, and the
bucketed-table shuffle-free join path."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from burla_spark.sources.sinks import (
    write_bucketed_table,
    write_csv,
    write_json,
    write_orc,
    write_xml,
    write_parquet,
    write_text,
)
from burla_spark.sources.tables import load_table


def test_parquet_partitioned_roundtrip(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "orders_by_status")
        write_parquet(o, path, partition_by=["o_orderstatus"])
        # hive-style partition dirs exist
        assert any(d.startswith("o_orderstatus=") for d in os.listdir(path))
        back = spark.read.parquet(path)
        assert back.count() == o.count()
        # partition pruning: the status predicate must land in
        # PartitionFilters (pruned directories), not post-scan Filter
        pruned = back.filter(F.col("o_orderstatus") == "F")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "o_orderstatus" in plan.split(
            "PartitionFilters:"
        )[1].split("]")[0], f"status filter not pruned:\n{plan[:1500]}"
        assert pruned.count() == o.filter(F.col("o_orderstatus") == "F").count()


def test_csv_roundtrip(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "customer_csv")
        write_csv(c, path)
        back = (
            spark.read.option("header", True)
            .schema(c.schema)
            .csv(path)
        )
        assert sorted(r.c_custkey for r in back.collect()) == sorted(
            r.c_custkey for r in c.collect()
        )


def test_json_roundtrip(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "nation_json")
        write_json(n, path)
        back = spark.read.schema(n.schema).json(path)
        assert {r.n_name for r in back.collect()} == {r.n_name for r in n.collect()}


def test_schema_inference_csv(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "region_csv")
        write_csv(r, path)
        inferred = spark.read.option("header", True).option("inferSchema", True).csv(path)
        assert dict(inferred.dtypes)["r_regionkey"] == "int"


def test_orc_roundtrip_with_pushdown(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "nation_orc")
        write_orc(n, path)
        back = spark.read.orc(path)
        assert sorted(r.n_name for r in back.collect()) == sorted(
            r.n_name for r in n.collect()
        )
        # predicate reaches the ORC scan (same pushdown contract as parquet)
        plan = (
            back.filter(F.col("n_nationkey") == 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [" in plan and "n_nationkey" in plan


def test_text_roundtrip(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    lines = d.select(
        F.regexp_replace(F.col("text"), r"[\r\n]", " ").alias("value")
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "docs_txt")
        write_text(lines, path)
        back = spark.read.text(path)
        assert back.count() == 50
        assert back.columns == ["value"]
        assert sorted(r.value for r in back.collect()) == sorted(
            r.value for r in lines.collect()
        )


def test_xml_roundtrip(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "nation_xml")
        write_xml(n, path, row_tag="nation")
        back = spark.read.format("xml").option("rowTag", "nation").load(path)
        assert back.count() == n.count()
        assert sorted(r.n_name for r in back.collect()) == sorted(
            r.n_name for r in n.collect()
        )


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(o, "orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed_table(l, "lineitem_b", "l_orderkey", 8, sort_col="l_orderkey")
    ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_python_datasource_deterministic(spark, sf_dir):
    """Custom Python DataSource (Spark 4): partition-parallel synthetic
    generator with a declared schema — deterministic across reads."""
    from burla_spark.sources.pysource import register

    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 500)
        .option("partitions", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 500
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, spark.read.format("synthetic_events").option("rows", 500).option("partitions", 8).load().collect()))
    assert a == b
    # schema is declared, not inferred
    assert dict(df.dtypes) == {
        "event_id": "bigint",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
    }
    # aggregation over the custom source runs as a normal relation
    assert df.groupBy("event_type").count().count() == 5


def test_compact_parquet_small_files(spark, sf_dir):
    import glob
    import os
    import tempfile

    from burla_spark.sources.sinks import compact_parquet
    from burla_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "fragmented")
        dst = os.path.join(tmp, "compacted")
        # simulate a streaming/per-task writer: 32 tiny files
        o.repartition(32).write.parquet(src)
        n_before, n_after = compact_parquet(
            spark, src, dst, target_file_bytes=1 << 20
        )
        assert n_before == 32
        assert n_after < n_before
        assert n_after == len(glob.glob(os.path.join(dst, "*.parquet")))
        # content survives exactly
        a = spark.read.parquet(src)
        b = spark.read.parquet(dst)
        assert b.count() == a.count()
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_avro_roundtrip_if_available(spark, sf_dir):
    """Avro is a built-in-but-external Spark module (spark-avro jar);
    this container doesn't deploy it, so the test skips here and runs
    unchanged where the jar is on the classpath."""
    import os
    import tempfile

    import pytest

    from burla_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "orders_avro")
        try:
            o.write.format("avro").save(path)
        except Exception as exc:
            if "Failed to find data source: avro" in str(exc):
                pytest.skip("spark-avro module not deployed in this env")
            raise
        back = spark.read.format("avro").load(path)
        assert back.count() == o.count()
        assert back.exceptAll(o).count() == 0


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution on a growing table directory: day-2 files add a
    column; mergeSchema=true reads the union schema with NULLs for the
    old files — the contract a long-lived 100 TB table relies on when
    new fields appear mid-history."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "evolving")
    spark.range(3).select(
        F.col("id"), F.lit("v1").alias("payload")
    ).write.parquet(base + "/day=1")
    spark.range(3, 6).select(
        F.col("id"), F.lit("v2").alias("payload"), F.lit(7).alias("score")
    ).write.parquet(base + "/day=2")
    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"id", "payload", "score", "day"}
    rows = {r.id: (r.score, r.day) for r in df.collect()}
    assert rows[0] == (None, 1) and rows[5] == (7, 2)


def test_python_datasource_jsonl_partitions_and_pushdown(spark, tmp_path):
    """Custom DataSource V2 in Python (Spark 4): partition-per-file
    parallel read, schema-typed rows, and pushFilters handling the
    simple comparisons while yielding the rest back to Spark."""
    import json as _json

    from pyspark.sql import functions as F

    from burla_spark.sources.pydatasource import JsonlDataSource, JsonlReader

    src = tmp_path / "docs"
    src.mkdir()
    rows = [{"doc_id": i, "text": f"doc number {i}", "score": i * 10} for i in range(30)]
    for part in range(3):
        with open(src / f"part{part}.jsonl", "w") as fh:
            for r in rows[part * 10 : (part + 1) * 10]:
                fh.write(_json.dumps(r) + "\n")

    spark.dataSource.register(JsonlDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("burla_jsonl")
        .schema("doc_id long, text string, score long")
        .option("path", str(src))
        .load()
    )
    assert df.count() == 30
    assert df.rdd.getNumPartitions() == 3  # one per file
    got = df.filter((F.col("score") > 40) & (F.col("score") < 200)).collect()
    assert sorted(r.doc_id for r in got) == list(range(5, 20))

    # pushFilters contract, driver-side: comparisons absorbed, others yielded
    from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("doc_id long, text string, score long")
    reader = JsonlReader(schema, {"path": str(src)})
    leftover = list(
        reader.pushFilters(
            [GreaterThan(("score",), 40), EqualTo(("text",), "x"), IsNotNull(("text",))]
        )
    )
    assert [type(f).__name__ for f in leftover] == ["IsNotNull"]
    assert ("score", ">", 40) in reader._pushed and ("text", "=", "x") in reader._pushed


def test_python_streaming_datasource_microbatch_protocol(spark):
    """Custom DataSourceStreamReader: offsets advance rows_per_batch at
    a time, partitions split each batch, and the availableNow replay
    terminates at max_rows with rows identical to the batch source
    (same splitmix64 derivation — deterministic replay is the
    exactly-once property)."""
    import time

    from burla_spark.sources.pysource import register

    register(spark)
    q = (
        spark.readStream.format("synthetic_events")
        .option("maxRows", 450)
        .option("rowsPerBatch", 100)
        .option("seed", 7)
        .load()
        .writeStream.format("memory")
        .queryName("synthetic_stream")
        .outputMode("append")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline and spark.table("synthetic_stream").count() < 450:
        time.sleep(0.3)
    q.stop()
    q.awaitTermination()
    got = spark.table("synthetic_stream").collect()
    assert len(got) == 450
    batch = (
        spark.read.format("synthetic_events")
        .option("rows", 450)
        .option("seed", 7)
        .load()
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(q.recentProgress) >= 4  # it really ran as micro-batches


def test_python_datasource_writer_two_phase_commit(spark, tmp_path):
    """The custom sink's staged-write/commit protocol: a round trip
    through write + read returns the exact rows, committed files are
    part-*.jsonl with no staged leftovers, and overwrite replaces the
    previous committed set."""
    from burla_spark.sources.pydatasource import JsonlDataSource

    spark.dataSource.register(JsonlDataSource)
    out = str(tmp_path / "sink")
    df = spark.range(20).selectExpr("id AS doc_id", "concat('t', id) AS text")
    df.repartition(3).write.format("burla_jsonl").option("path", out).mode(
        "append"
    ).save()
    import os

    names = sorted(os.listdir(out))
    assert all(n.startswith("part-") and n.endswith(".jsonl") for n in names)
    back = (
        spark.read.format("burla_jsonl")
        .schema("doc_id long, text string")
        .option("path", out)
        .load()
    )
    assert sorted((r.doc_id, r.text) for r in back.collect()) == [
        (i, f"t{i}") for i in range(20)
    ]
    spark.range(5).selectExpr("id AS doc_id", "'x' AS text").write.format(
        "burla_jsonl"
    ).option("path", out).mode("overwrite").save()
    back2 = (
        spark.read.format("burla_jsonl")
        .schema("doc_id long, text string")
        .option("path", out)
        .load()
    )
    assert back2.count() == 5


def test_jsonl_writer_append_never_clobbers_prior_parts(spark, tmp_path):
    """ADVICE r04: append mode used to rename staged files to
    part-00000.. from index 0, silently replacing the previous job's
    committed parts. Committed names must offset past existing files
    so two sequential append jobs both survive."""
    from burla_spark.sources.pydatasource import JsonlDataSource

    spark.dataSource.register(JsonlDataSource)
    out = str(tmp_path / "jsonl_append")
    df1 = spark.range(0, 5).selectExpr("id", "id * 2 AS v")
    df2 = spark.range(100, 103).selectExpr("id", "id * 2 AS v")
    df1.coalesce(1).write.format("burla_jsonl").option("path", out).mode(
        "append"
    ).save()
    df2.coalesce(1).write.format("burla_jsonl").option("path", out).mode(
        "append"
    ).save()
    got = sorted(
        map(tuple, spark.read.format("burla_jsonl").schema("id long, v long")
            .option("path", out).load().collect())
    )
    assert got == [(i, i * 2) for i in [0, 1, 2, 3, 4, 100, 101, 102]]


def test_synthetic_stream_checkpoint_restart_exactly_once(spark, tmp_path):
    """ADVICE r04: the stream reader's offset cursor lived only in
    instance state, so a restarted run advertised offsets below the
    checkpointed start. Drive a real stop/restart against one
    checkpoint: the union of both runs must be every row exactly once."""
    import time

    from burla_spark.sources.pysource import register

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "restart_out")

    def run(until_rows):
        q = (
            spark.readStream.format("synthetic_events")
            .option("maxRows", 400)
            .option("rowsPerBatch", 50)
            .option("seed", 11)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= until_rows:
                    break
            except Exception:
                pass
            time.sleep(0.3)
        q.stop()
        q.awaitTermination()

    run(150)  # first run: partial
    n_first = spark.read.parquet(out).count()
    assert 150 <= n_first < 400
    run(400)  # second run resumes from the SAME checkpoint
    got = spark.read.parquet(out).collect()
    assert len(got) == 400, f"restart produced {len(got)} rows (dupes or loss)"
    assert sorted(r.event_id for r in got) == list(range(400))
