"""Offline contract tests for the MongoDB source (round-6 verdict item 6):
every option key the engine emits must exist in the VENDORED copy of the
connector's documented v10.x batch-read config schema — the strongest check
possible in an image without the jar or egress. A typo'd option would be
silently IGNORED by the real connector (for `aggregation.pipeline` that
degrades the R2 incremental scan into a full-collection read), so name
drift must fail offline, not in production."""

from __future__ import annotations

import json

import pytest

from metrics_database_cron_script_spark.sources.mongo import (
    CONNECTOR_READ_OPTIONS,
    CONNECTOR_READ_PREFIX,
    incremental_read_options,
    validate_read_options,
)

OPTS = incremental_read_options(
    "mongodb://example.invalid:27017",
    "metrics",
    "transactions",
    "ts",
    "2024-03-01T00:00:00",
)


def test_every_emitted_option_is_documented():
    normalized = validate_read_options(OPTS)
    assert set(normalized) == {
        "connection.uri",
        "database",
        "collection",
        "aggregation.pipeline",
    }
    assert normalized["connection.uri"] == "mongodb://example.invalid:27017"
    assert normalized["database"] == "metrics"
    assert normalized["collection"] == "transactions"


def test_prefixed_and_bare_forms_normalize_identically():
    bare = validate_read_options({"database": "db"})
    prefixed = validate_read_options({CONNECTOR_READ_PREFIX + "database": "db"})
    assert bare == prefixed == {"database": "db"}


def test_undocumented_option_refused_not_silently_dropped():
    with pytest.raises(KeyError, match="aggregation.pipelin"):
        validate_read_options({"aggregation.pipelin": "[]"})  # typo
    with pytest.raises(KeyError, match="not in the vendored"):
        validate_read_options({"spark.mongodb.read.pipeline": "[]"})


def test_watermark_pipeline_is_valid_extended_json_match_stage():
    """The $gt stage must be parseable extended JSON with a $date the
    server can compare against BSON datetimes (updatescript.py:59's
    `{ts: {"$gt": wm}}` rendered server-side)."""
    pipeline = json.loads(validate_read_options(OPTS)["aggregation.pipeline"])
    assert isinstance(pipeline, list) and len(pipeline) == 1
    (stage,) = pipeline
    assert set(stage) == {"$match"}
    assert stage["$match"] == {"ts": {"$gt": {"$date": "2024-03-01T00:00:00.000Z"}}}


def test_vendored_contract_covers_the_incremental_surface():
    """The keys the engine relies on exist in the vendored schema (guards
    against someone pruning the constant without checking emitters)."""
    for needed in ("connection.uri", "database", "collection", "aggregation.pipeline"):
        assert needed in CONNECTOR_READ_OPTIONS


def test_smoke_script_exists_and_targets_connector_jar():
    import os
    import stat

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sh = os.path.join(root, "scripts", "mongo_connector_smoke.sh")
    py = os.path.join(root, "scripts", "mongo_connector_smoke.py")
    assert os.path.isfile(sh) and os.path.isfile(py)
    with open(sh) as f:
        body = f.read()
    assert "--packages org.mongodb.spark:mongo-spark-connector_2.13" in body
    assert stat.S_IXUSR & os.stat(sh).st_mode


def test_write_options_validated_against_vendored_contract():
    """Round 10 (verdict item 8): the WRITE path's option names are
    asserted against the vendored v10.x batch-write contract the same way
    the read path is — a typo'd idFieldList/operationType would be
    silently ignored live, turning a keyed upsert into duplicate-row
    inserts."""
    from metrics_database_cron_script_spark.sources.mongo import (
        CONNECTOR_WRITE_OPTIONS,
        append_write_options,
        upsert_write_options,
        validate_write_options,
    )

    up = upsert_write_options(
        "mongodb://example.invalid:27017", "metrics", "stats", ["chain"]
    )
    assert up["operationType"] == "replace" and up["upsertDocument"] == "true"
    assert up["idFieldList"] == "chain"
    assert set(up) <= CONNECTOR_WRITE_OPTIONS

    ap = append_write_options(
        "mongodb://example.invalid:27017", "metrics", "sink_aum"
    )
    assert ap["operationType"] == "insert"
    assert set(ap) <= CONNECTOR_WRITE_OPTIONS

    # prefixed form normalizes; unknown keys refuse loudly
    pre = validate_write_options(
        {"spark.mongodb.write.maxBatchSize": "512"}
    )
    assert pre == {"maxBatchSize": "512"}
    with pytest.raises(KeyError, match="batch-write contract"):
        validate_write_options({"idFieldsList": "chain"})  # typo'd name
