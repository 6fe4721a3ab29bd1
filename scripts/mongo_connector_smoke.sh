#!/usr/bin/env bash
# Live MongoDB connector smoke (needs egress to resolve the jar):
#   scripts/mongo_connector_smoke.sh mongodb://<host>/<db> <db> <coll> [wm_field] [wm_iso]
# The Scala suffix must match the Spark build (Spark 4.x ships Scala 2.13).
set -euo pipefail
cd "$(dirname "$0")/.."
exec spark-submit \
  --packages org.mongodb.spark:mongo-spark-connector_2.13:10.4.1 \
  scripts/mongo_connector_smoke.py "$@"
