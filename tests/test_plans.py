"""Scale-critical physical-plan properties (the .explain discipline):
filters push to parquet scans, partition pruning hits the bucket column,
small dims broadcast, wide binary columns are pruned out of token paths."""

import pytest
from pyspark.sql import functions as F

from words_in_context_spark.plans.inspect import (
    has_broadcast_join,
    plan_string,
    pushed_filters,
    read_schema,
)

SF001 = "/root/testdata/sf0.001"


def test_pricing_summary_pushdown(spark):
    from words_in_context_spark.driver_queries import q_pricing_summary

    df = q_pricing_summary(spark, SF001)
    pf = pushed_filters(df)
    assert "l_shipdate" in pf, pf  # predicate reached the parquet scan
    rs = read_schema(df)
    assert "l_partkey" not in rs  # unused columns pruned from the scan


def test_flagship_broadcasts_df_dim(spark):
    from words_in_context_spark.driver_queries import q_tfidf_topk

    df = q_tfidf_topk(spark, SF001)
    assert has_broadcast_join(df)
    # the scan reads only (doc_id, text) — no lang/source/n_chars
    rs = read_schema(df)
    assert "n_chars" not in rs and "source" not in rs


def test_flagship_serves_from_forward_index(spark):
    """The 100TB serving invariant: tfidf/bm25 scan the materialized
    forward index, never the raw corpus — 'text' must not appear in any
    ReadSchema; the df-aggregate branch must be column-pruned to term only;
    and the per-doc rank must be limited map-side (WindowGroupLimit Partial
    before the exchange — Spark's top-k-per-group pushdown)."""
    from words_in_context_spark.driver_queries import (
        _forward,
        q_bm25_topk,
        q_tfidf_topk,
    )

    _forward(spark, SF001)  # ensure the cache exists so plans read it
    for q in (q_tfidf_topk, q_bm25_topk):
        df = q(spark, SF001)
        rs = read_schema(df)
        assert "text" not in rs, f"{q.__name__} re-tokenizes the corpus"
        assert "wics_fwd" in plan_string(df, mode="simple") or "fwd" in (
            plan_string(df, mode="simple")
        )
    plan = plan_string(q_tfidf_topk(spark, SF001))
    assert "WindowGroupLimit" in plan, plan  # map-side per-doc top-k
    assert "struct<term:string>" in read_schema(q_tfidf_topk(spark, SF001))


def test_revenue_join_broadcasts_dims(spark):
    from words_in_context_spark.driver_queries import q_revenue_by_nation

    assert has_broadcast_join(q_revenue_by_nation(spark, SF001))


def test_segment_scan_prunes_buckets_and_pushes_terms(spark, tmp_path):
    from words_in_context_spark.corpus import generate_pages
    from words_in_context_spark.index.build import build_index
    from words_in_context_spark.index.query import _segment_rows, load_index

    pages = generate_pages(8, seed=99)
    docs = spark.createDataFrame(
        [(p["url"], p["text"], p["lang"]) for p in pages],
        "url string, text string, lang string",
    )
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx, n_buckets=8, n_salts=4)
    h = load_index(idx)
    seg = _segment_rows(spark, h, ["storm", "the"])
    plan = plan_string(seg)
    pf = pushed_filters(seg)
    assert "PartitionFilters" in pf and "bucket" in pf, plan  # dir pruning
    assert "term" in pf, plan  # row-group/dictionary pushdown on term


def test_token_path_reads_html_only_for_textless_rows(spark, tmp_path):
    """Mixed tables split into two scans: the text-bearing branch must scan
    only (url, text, lang) — the wide html binary never enters its parquet
    read or Arrow transfer — and the html branch must carry the pushed
    textless filter (IsNull) so text-complete row groups skip it. warc_ts is
    pruned everywhere."""
    from words_in_context_spark.corpus import generate_pages
    from words_in_context_spark.operators.extract import tokenize

    pages = generate_pages(4, seed=1)
    spark.createDataFrame(
        [(p["url"], p["warc_ts"].replace(tzinfo=None), p["html"], p["text"], p["lang"])
         for p in pages],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).write.parquet(str(tmp_path / "pages"))
    docs = spark.read.parquet(str(tmp_path / "pages"))

    plan = plan_string(tokenize(docs), mode="simple")
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    text_scans = [s for s in scans if "text#" in s.split("]")[0]]
    html_scans = [s for s in scans if "html#" in s.split("]")[0]]
    assert text_scans and html_scans, plan
    # the text-bearing scan never touches the binary column
    assert any("html#" not in s.split("]")[0] for s in text_scans), plan
    # the html scan only fires for textless rows (filter pushed to parquet)
    assert all("IsNull(text)" in s for s in html_scans), plan
    assert "warc_ts" not in plan
    # html IS the scanned content column when it's the only one present
    rs2 = read_schema(tokenize(docs.select("url", "html", "lang")))
    assert "html" in rs2