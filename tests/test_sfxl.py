"""gen_sfxl replication must be KEY-CONSISTENT: every join in the query
contract scales exactly N× — no cross-replica key collisions (which would
inflate fan-in) and no broken FKs (which would drop rows)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_replicate_scales_joins_exactly(tmp_path):
    from gen_sfxl import replicate
    from metrics_database_cron_script_spark.oracle import duckdb_connect

    out = str(tmp_path / "x2")
    counts = replicate(SF_SMOKE, out, 2)

    base = duckdb_connect(SF_SMOKE)
    big = duckdb_connect(out)

    def q(con, sql):
        return con.execute(sql).fetchone()[0]

    # row counts: replicated tables 2x, fixed dims 1x
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "events", "documents", "embeddings"):
        assert counts[t] == 2 * q(base, f"SELECT COUNT(*) FROM {t}"), t
    for t in ("nation", "region"):
        assert counts[t] == q(base, f"SELECT COUNT(*) FROM {t}"), t

    # key spaces must not collide across replicas
    for t, k in (("orders", "o_orderkey"), ("customer", "c_custkey"),
                 ("events", "event_id"), ("documents", "doc_id")):
        assert q(big, f"SELECT COUNT(DISTINCT {k}) FROM {t}") == 2 * q(
            base, f"SELECT COUNT(DISTINCT {k}) FROM {t}"
        ), t

    # FK joins scale EXACTLY 2x — both directions of the star
    joins = [
        "SELECT COUNT(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey",
        "SELECT COUNT(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey",
        "SELECT COUNT(*) FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey",
        "SELECT COUNT(*) FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey",
        "SELECT COUNT(*) FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey",
    ]
    for sql in joins:
        assert q(big, sql) == 2 * q(base, sql), sql

    # near-dup structure preserved: replica docs are tagged, so the exact
    # duplicate count must scale 2x, not explode into cross-replica clones
    dup_sql = """
      SELECT COUNT(*) FROM (
        SELECT text FROM documents GROUP BY text HAVING COUNT(*) > 1
      )"""
    assert q(big, dup_sql) == 2 * q(base, dup_sql)
