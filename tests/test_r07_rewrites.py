"""Round-7 query-rewrite equivalence pins.

Each optimization round rewrite of a declared battery query must compute
the IDENTICAL result set (the driver re-hashes every query against its
DuckDB oracle). The oracle gate is the authoritative check; these tests
pin the same equivalences inside pytest — rewrite vs the pre-r7 reference
formulation on real testdata — so a future refactor that drifts a rewrite
fails CI without needing DuckDB.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF001

SF = SF001


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bm25_avgdl_shortcut_is_exact(spark):
    """sum(tf)/countDistinct(doc_id) must equal avg(per-doc doc_len) to the
    last bit: both are exact integer sums < 2^53 divided in double."""
    from words_in_context_spark.driver_queries import _forward

    tf = _forward(spark, SF)
    ref = (
        tf.groupBy("doc_id")
        .agg(F.first("doc_len").alias("doc_len"))
        .agg(F.avg("doc_len"))
        .collect()[0][0]
    )
    tot, nd = tf.agg(F.sum("tf"), F.countDistinct(F.col("doc_id"))).collect()[0]
    assert float(tot) / float(nd) == ref


def test_bm25_matches_unoptimized_reference(spark):
    from words_in_context_spark.driver_queries import (
        BM25_B,
        BM25_K1,
        BM25_QUERY_TERMS,
        _forward,
        _read,
        q_bm25_topk,
    )

    docs = _read(spark, SF, "documents")
    n_docs = docs.count()
    tf = _forward(spark, SF)
    avgdl = (
        tf.groupBy("doc_id")
        .agg(F.first("doc_len").alias("doc_len"))
        .agg(F.avg("doc_len"))
        .collect()[0][0]
    )
    dfq = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = spark.createDataFrame(
        [(t,) for t in BM25_QUERY_TERMS], "term string"
    )
    contrib = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfq), "term")
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "part",
            F.col("idf") * F.col("tf") * (BM25_K1 + 1)
            / (
                F.col("tf")
                + BM25_K1
                * (1 - BM25_B + BM25_B * F.col("doc_len") / F.lit(float(avgdl)))
            ),
        )
    )
    scores = contrib.groupBy("doc_id").agg(
        F.round(F.sum("part"), 6).alias("score6"),
        F.round(F.sum("part"), 4).alias("score"),
    )
    top = scores.orderBy(F.desc("score6"), F.asc("doc_id")).limit(20)
    w = Window.orderBy(F.desc("score6"), F.asc("doc_id"))
    ref = top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score", "rank"
    )
    assert _rows(q_bm25_topk(spark, SF)) == _rows(ref)


def test_bm25_pushes_query_terms_to_scan(spark):
    from words_in_context_spark.driver_queries import _forward, q_bm25_topk
    from words_in_context_spark.plans.inspect import pushed_filters

    _forward(spark, SF)
    pf = pushed_filters(q_bm25_topk(spark, SF))
    assert "In(term" in pf, pf


def test_top_orders_matches_window_reference(spark):
    from words_in_context_spark.driver_queries import (
        _read,
        q_top_orders_per_customer,
    )

    o = _read(spark, SF, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(F.round("o_totalprice", 2)), F.asc("o_orderkey")
    )
    ref = (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )
    assert _rows(q_top_orders_per_customer(spark, SF)) == _rows(ref)


def test_postings_matches_single_level_reference(spark):
    from words_in_context_spark.driver_queries import _tf, q_postings

    tf = _tf(spark, SF)
    ref = tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                lambda s: F.concat_ws(
                    ":", s.doc_id.cast("string"), s.tf.cast("string")
                ),
            ),
        ).alias("postings"),
    )
    assert _rows(q_postings(spark, SF)) == _rows(ref)


def test_events_hourly_matches_string_key_reference(spark):
    from words_in_context_spark.driver_queries import _read, q_events_hourly

    e = _read(spark, SF, "events")
    ref = e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )
    assert _rows(q_events_hourly(spark, SF)) == _rows(ref)


def test_revenue_uses_shuffle_hash_for_fact_join(spark):
    from words_in_context_spark.driver_queries import (
        _read,
        q_revenue_by_nation,
    )
    from words_in_context_spark.plans.inspect import plan_string

    plan = plan_string(q_revenue_by_nation(spark, SF))
    assert "ShuffledHashJoin" in plan, plan
    # and the result is identical to the hint-free formulation
    li = _read(spark, SF, "lineitem")
    o = _read(spark, SF, "orders")
    c = _read(spark, SF, "customer")
    n = _read(spark, SF, "nation")
    ref = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
    assert _rows(q_revenue_by_nation(spark, SF)) == _rows(ref)
