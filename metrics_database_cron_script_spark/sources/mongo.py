"""MongoDB source parity stub.

The reference reads production MongoDB collections directly
(``ogclient.test``, updatescript.py:12/:23). The Spark-native equivalent is
the official MongoDB Spark Connector — a jar this image does not ship, so
the reader is gated: it raises with the exact config needed on a cluster
that has ``org.mongodb.spark:mongo-spark-connector`` on the classpath.

The incremental-scan shape is identical to the parquet path: the watermark
predicate (`R2`) pushes down into the connector as a ``$gt`` aggregation
stage, so `pipelines.run_batch` works unchanged against either source —
swap `load_table` for `read_mongo_collection`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_mongo_collection(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    schema: str | None = None,
) -> DataFrame:
    """Read a MongoDB collection as a DataFrame (requires the connector jar).

    On a provisioned cluster:
        spark.read.format("mongodb")
             .option("spark.mongodb.read.connection.uri", uri)
             .option("spark.mongodb.read.database", database)
             .option("spark.mongodb.read.collection", collection)
             .schema(schema)   # declared, not inferred — engine stance
             .load()
    """
    reader = (
        spark.read.format("mongodb")
        .option("spark.mongodb.read.connection.uri", uri)
        .option("spark.mongodb.read.database", database)
        .option("spark.mongodb.read.collection", collection)
    )
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "MongoDB source requires the mongo-spark-connector jar "
            "(org.mongodb.spark:mongo-spark-connector_2.13) on the cluster "
            "classpath; this image does not ship it. The parquet fixtures "
            "exercise the identical plan shapes."
        ) from exc
