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
row counts and the incremental plan so pushdown is visible. Exit 0 = the
engine's option contract works against a real connector.
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

    spark = SparkSession.builder.appName("mongo-connector-smoke").getOrCreate()
    full = read_mongo_collection(spark, uri, database, collection)
    print(f"full scan: {full.count()} rows; schema: {full.schema.simpleString()}")
    if wm_field:
        inc = read_mongo_incremental(
            spark, uri, database, collection, wm_field, wm_value
        )
        inc.explain()
        print(f"incremental ({wm_field} > {wm_value}): {inc.count()} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
