"""DuckDB twins for the KG training-data operators — the shared
60-bit md5 hash family makes the split and the negatives byte-equal
between engines (no tolerance, no gate slot needed)."""

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from gliner_spark.session import build_session

    s = build_session(app_name="gliner-kgtrain-tests", cores=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def edges(spark):
    """Deterministic triple table with predicates and reverse
    duplicates (to exercise the leakage rule)."""
    base = spark.range(0, 400).select(
        (F.abs(F.xxhash64("id", F.lit(1))) % 30).alias("src_entity"),
        F.concat(F.lit("p"), (F.abs(F.xxhash64("id", F.lit(2))) % 3)
                 .cast("string")).alias("pred"),
        (F.abs(F.xxhash64("id", F.lit(3))) % 30).alias("dst_entity"),
    ).where(F.col("src_entity") != F.col("dst_entity"))
    rev = base.limit(40).select(
        F.col("dst_entity").alias("src_entity"),
        "pred",
        F.col("src_entity").alias("dst_entity"),
    )
    return base.unionByName(rev).distinct().localCheckpoint(eager=True)


def _con(**frames):
    con = duckdb.connect()
    for name, pdf in frames.items():
        con.register(name, pdf)
    return con


def test_edge_split_matches_duckdb_and_is_leak_free(spark, edges):
    from gliner_spark.operators.kgtrain import edge_split

    got = {
        (r.src_entity, r.pred, r.dst_entity): r.split
        for r in edge_split(edges, 0.2, 0.1, seed=13).collect()
    }
    con = _con(e=edges.toPandas())
    want = {
        (s, p, o): sp
        for s, p, o, sp in con.execute(
            """
            SELECT src_entity, pred, dst_entity,
              CASE WHEN u < 0.2 THEN 'test'
                   WHEN u < 0.3 THEN 'valid' ELSE 'train' END
            FROM (
              SELECT *, (('0x' || substr(md5(
                  least(src_entity, dst_entity)::VARCHAR || chr(31) ||
                  greatest(src_entity, dst_entity)::VARCHAR || chr(31) ||
                  pred || chr(31) || '13'), 1, 15))::BIGINT % 1000000)
                / 1000000.0 AS u
              FROM e)
            """
        ).fetchall()
    }
    assert got == want
    # all three splits realized, roughly at the requested rates
    from collections import Counter

    c = Counter(got.values())
    n = sum(c.values())
    assert 0.1 < c["test"] / n < 0.3 and 0.03 < c["valid"] / n < 0.2

    # leakage rule: an edge and its reverse always co-split
    for (s, p, o), sp in got.items():
        if (o, p, s) in got:
            assert got[(o, p, s)] == sp


def test_negative_sample_matches_duckdb(spark, edges):
    from gliner_spark.operators.kgtrain import negative_sample

    got = {
        (r.src_entity, r.pred, r.dst_entity, r.attempt, r.neg_dst)
        for r in negative_sample(edges, k=2, buckets=8, seed=17).collect()
    }
    con = _con(e=edges.toPandas())
    want = {
        tuple(r)
        for r in con.execute(
            """
            WITH ded AS (SELECT DISTINCT src_entity s, pred p, dst_entity o
                         FROM e),
            nodes AS (
              SELECT node,
                ('0x' || substr(md5(node::VARCHAR || chr(31) || '17'),
                 1, 15))::BIGINT % 8 AS nb
              FROM (SELECT s node FROM ded UNION SELECT o FROM ded)),
            cand AS (
              SELECT s, p, o, attempt,
                ('0x' || substr(md5(s::VARCHAR || chr(31) || p || chr(31)
                  || o::VARCHAR || chr(31) || attempt::VARCHAR || chr(31)
                  || '17'), 1, 15))::BIGINT % 8 AS tb
              FROM ded, (SELECT unnest([1, 2]) attempt)),
            picked AS (
              SELECT s, p, o, attempt,
                min_by(node, ('0x' || substr(md5(node::VARCHAR || chr(31)
                  || s::VARCHAR || chr(31) || p || chr(31) || o::VARCHAR
                  || chr(31) || attempt::VARCHAR), 1, 15))::BIGINT)
                  AS neg_dst
              FROM cand JOIN nodes ON nodes.nb = cand.tb
              GROUP BY s, p, o, attempt)
            SELECT pk.s, pk.p, pk.o, pk.attempt, pk.neg_dst
            FROM picked pk
            ANTI JOIN ded t ON t.s = pk.s AND t.p = pk.p
                            AND t.o = pk.neg_dst
            WHERE pk.neg_dst <> pk.o
            """
        ).fetchall()
    }
    assert got == want and len(got) > 100


def test_negative_sample_excludes_true_edges(spark, edges):
    from gliner_spark.operators.kgtrain import negative_sample

    neg = negative_sample(edges, k=2, buckets=8)
    true = edges.select(
        "src_entity", "pred", F.col("dst_entity").alias("neg_dst")
    )
    assert neg.join(true, ["src_entity", "pred", "neg_dst"]).count() == 0
    assert neg.where(F.col("neg_dst") == F.col("dst_entity")).count() == 0
    # deterministic: rerun is identical
    a = sorted(map(tuple, neg.collect()))
    b = sorted(map(tuple, negative_sample(edges, k=2, buckets=8).collect()))
    assert a == b


def test_md5h_null_inputs_do_not_collide(spark):
    """r6 ADVICE: concat_ws SKIPS nulls, so a null pred used to
    collapse distinct keys (e.g. (1, NULL, 2x) vs (1, NULL2, x...)).
    md5h now coalesces each input to a sentinel, so null-bearing keys
    stay distinct from each other and from their concatenated lookalikes."""
    from pyspark.sql import functions as F

    from gliner_spark.operators.kgtrain import md5h

    rows = spark.createDataFrame(
        [
            (1, None, "ax"),
            (1, "a", "x"),   # old concat_ws would join both to "1\x1fa\x1fx"-like keys
            (1, None, "bx"),
        ],
        "s long, p string, o string",
    ).select(md5h("s", "p", "o").alias("h")).collect()
    hashes = [r.h for r in rows]
    assert len(set(hashes)) == 3
