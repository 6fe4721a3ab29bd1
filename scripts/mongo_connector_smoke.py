#!/usr/bin/env python
"""One-command live validation of the MongoDB source on an egress-capable
cluster (this repo's image ships no connector jar, so the jar-present path
can only be exercised where `--packages` can resolve it).

    scripts/mongo_connector_smoke.sh mongodb://<host>/<db> <db> <coll> \
        [watermark_field] [watermark_iso]

Reads the collection twice through the SAME option maps the engine builds
(sources/mongo.py): a full scan (reference R1) and, when a watermark is
given, an incremental scan whose `$gt` predicate runs server-side as an
aggregation `$match` stage (reference R2, updatescript.py:59). Prints both
row counts and the incremental plan so pushdown is visible.

Round 10: also drives the WRITE path against a scratch collection
(`<coll>__smoke_sink`): an R8-shape insert append, then an R9-shape keyed
upsert (operationType=replace + idFieldList) applied TWICE with changed
values — the re-read must show the second write's values with no
duplicate keys, the connector equivalent of update_one(..., upsert=True).
Exit 0 = the engine's full option contract works against a real connector.
"""

from __future__ import annotations

import sys


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    uri, database, collection = sys.argv[1:4]
    wm_field = sys.argv[4] if len(sys.argv) > 4 else None
    wm_value = sys.argv[5] if len(sys.argv) > 5 else "1970-01-01T00:00:00"

    from pyspark.sql import SparkSession

    from metrics_database_cron_script_spark.sources.mongo import (
        read_mongo_collection,
        read_mongo_incremental,
    )

    from metrics_database_cron_script_spark.sources.mongo import (
        append_write_options,
        upsert_write_options,
    )

    spark = SparkSession.builder.appName("mongo-connector-smoke").getOrCreate()
    full = read_mongo_collection(spark, uri, database, collection)
    print(f"full scan: {full.count()} rows; schema: {full.schema.simpleString()}")
    if wm_field:
        inc = read_mongo_incremental(
            spark, uri, database, collection, wm_field, wm_value
        )
        inc.explain()
        print(f"incremental ({wm_field} > {wm_value}): {inc.count()} rows")

    # ---- write path (round 10): scratch sink, append then keyed upsert ----
    sink = f"{collection}__smoke_sink"

    def _write(df, opts):
        w = df.write.format("mongodb").mode("append")
        for k, v in opts.items():
            w = w.option(k, v)
        w.save()

    rows1 = spark.createDataFrame(
        [("polkadot", 1.0), ("kusama", 2.0)], "chain string, v double"
    )
    _write(rows1, append_write_options(uri, database, sink))
    rows2 = spark.createDataFrame(
        [("polkadot", 10.0), ("kusama", 20.0)], "chain string, v double"
    )
    up_opts = upsert_write_options(uri, database, sink, ["chain"])
    _write(rows2, up_opts)
    _write(rows2, up_opts)  # idempotent: second identical upsert is a no-op
    back = read_mongo_collection(spark, uri, database, sink)
    got = {r["chain"]: r["v"] for r in back.select("chain", "v").collect()}
    n = back.count()
    print(f"write-back: {n} rows, values {got}")
    assert got == {"polkadot": 10.0, "kusama": 20.0}, got
    assert n == 2, f"keyed upsert duplicated rows: {n}"
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
