"""Source/sink format coverage: the engine reads and writes more than
parquet — JSON, CSV, ORC round-trips with declared schemas (no inference in
the read path, mirroring the schema-on-write stance of sources/tables.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

# ts is TIMESTAMP_NTZ (naive wall-clock — the engine-wide contract from
# sources/tables.py); ORC enforces NTZ/LTZ agreement between file and read
# schema, so the round-trip must declare NTZ where parquet/JSON/CSV coerce.
SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"


def _events(spark):
    from metrics_database_cron_script_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "events").limit(200)


def _roundtrip(spark, df, path, fmt):
    df.write.format(fmt).mode("overwrite").save(path)
    back = spark.read.schema(SCHEMA).format(fmt).load(path)
    assert back.count() == df.count()
    a = df.select("event_id", "event_type", "value").orderBy("event_id").collect()
    b = back.select("event_id", "event_type", "value").orderBy("event_id").collect()
    assert a == b


def test_json_roundtrip(spark, tmp_path):
    _roundtrip(spark, _events(spark), str(tmp_path / "j"), "json")


def test_csv_roundtrip(spark, tmp_path):
    df = _events(spark)
    path = str(tmp_path / "c")
    df.write.option("header", True).mode("overwrite").csv(path)
    back = spark.read.schema(SCHEMA).option("header", True).csv(path)
    assert back.count() == df.count()
    a = {r["event_id"]: r["value"] for r in df.select("event_id", "value").collect()}
    b = {r["event_id"]: r["value"] for r in back.select("event_id", "value").collect()}
    assert a == b


def test_orc_roundtrip(spark, tmp_path):
    _roundtrip(spark, _events(spark), str(tmp_path / "o"), "orc")


def test_json_lines_with_nested_payload(spark, tmp_path):
    """REST-shaped nested JSON (reference R6 payload paths) through the file
    source: from_json with an explicit schema, struct field access."""
    payloads = [
        (1, '{"market_data": {"current_price": {"usd": 7.5}}}'),
        (2, '{"market_data": {"current_price": {"usd": 8.25}}}'),
    ]
    df = spark.createDataFrame(payloads, "id long, payload string")
    path = str(tmp_path / "nested")
    df.write.mode("overwrite").json(path)
    schema = "id long, payload string"
    back = spark.read.schema(schema).json(path)
    parsed = back.select(
        "id",
        F.from_json(
            "payload",
            "market_data struct<current_price: struct<usd: double>>",
        )["market_data"]["current_price"]["usd"].alias("usd"),
    )
    got = {r["id"]: r["usd"] for r in parsed.collect()}
    assert got == {1: 7.5, 2: 8.25}


def test_schema_evolution_mergeschema(spark, tmp_path):
    """Lake-style schema evolution: a later batch adds a column; mergeSchema
    reads both generations, old rows NULL-filled — the pattern for evolving
    fact tables without rewrites."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, 10.0)], "k long, v double")
    v1.write.parquet(f"{path}/batch=1")
    v2 = spark.createDataFrame([(2, 20.0, "eu")], "k long, v double, region string")
    v2.write.parquet(f"{path}/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(path)
    rows = {r["k"]: r["region"] for r in merged.collect()}
    assert rows == {1: None, 2: "eu"}
    assert set(merged.columns) >= {"k", "v", "region"}


def test_declared_schemas_match_fixtures(spark):
    """Guard against fixture/schema drift: every declared StructType must
    agree with the actual parquet files (names in order + compatible types)."""
    from tests.conftest import SF_SMOKE

    from metrics_database_cron_script_spark.sources import TABLES, load_table

    for name, declared in TABLES.items():
        df = load_table(spark, SF_SMOKE, name)
        assert [f.name for f in declared.fields] == df.columns, name
        for field in declared.fields:
            actual = df.schema[field.name].dataType
            assert actual == field.dataType, (name, field.name, actual, field.dataType)


# ---------------------------------------------------------------- files.py API

def test_read_csv_declared_schema(spark, tmp_path):
    from metrics_database_cron_script_spark.sources.files import read_csv

    df = _events(spark)
    path = str(tmp_path / "api_csv")
    df.write.option("header", True).mode("overwrite").csv(path)
    back = read_csv(spark, path, table="events")
    assert back.count() == df.count()
    assert [f.name for f in back.schema.fields] == [f.name for f in df.schema.fields]


def test_read_jsonl_quarantine_mode(spark, tmp_path):
    from metrics_database_cron_script_spark.sources.files import read_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s", "n_chars": 3}\n'
    )
    back = read_jsonl(
        spark, str(p), table="documents", permissive_corrupt_col="_corrupt"
    )
    rows = back.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt"] is not None]
    good = sorted(r["doc_id"] for r in rows if r["_corrupt"] is None)
    assert len(bad) == 1 and good == [1, 2]


def test_read_jsonl_failfast_raises(spark, tmp_path):
    import pytest as _pytest
    from metrics_database_cron_script_spark.sources.files import read_jsonl

    p = tmp_path / "bad2.jsonl"
    p.write_text('{"doc_id": 1}\nNOPE\n')
    with _pytest.raises(Exception) as ei:
        read_jsonl(spark, str(p), table="documents").collect()
    # must be the malformed-record failure specifically, not any incidental
    # error — otherwise a silent regression to PERMISSIVE would go unseen
    msg = str(ei.value)
    assert "Malformed" in msg or "FAILFAST" in msg, msg


def test_orc_round_trip_matches_parquet_source(spark, tmp_path):
    """ORC sink → ORC source round-trips the exact rows and declared types of
    a fixture table (the second columnar at-rest format; pushdown/pruning
    symmetric with parquet)."""
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.sources.files import read_orc, write_orc
    from tests.conftest import SF_SMOKE

    src = load_table(spark, SF_SMOKE, "customer")
    path = str(tmp_path / "customer.orc")
    write_orc(src, path)
    back = read_orc(spark, path, table="customer")
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    # contract check: a missing declared column fails loudly
    import pytest
    from pyspark.sql import functions as F

    write_orc(src.drop("c_mktsegment"), str(tmp_path / "short.orc"))
    with pytest.raises(ValueError, match="c_mktsegment"):
        read_orc(spark, str(tmp_path / "short.orc"), table="customer")

    # predicate pushdown reaches the ORC scan
    plan = (
        read_orc(spark, path, table="customer")
        .filter(F.col("c_custkey") == 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "c_custkey" in plan.split("PushedFilters", 1)[1][:200], plan


def test_orc_type_drift_fails_loudly(spark, tmp_path):
    """A delivery whose column type drifted must raise, not silently cast."""
    import pytest
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.sources.files import read_orc, write_orc
    from tests.conftest import SF_SMOKE

    src = load_table(spark, SF_SMOKE, "customer").withColumn(
        "c_custkey", F.col("c_custkey").cast("double")  # BIGINT -> DOUBLE drift
    )
    path = str(tmp_path / "drift.orc")
    write_orc(src, path)
    with pytest.raises(ValueError, match="type drift"):
        read_orc(spark, path, table="customer")
