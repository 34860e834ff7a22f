"""Query engine over the built index: BM25 top-k via block-max WAND.

Two execution paths sharing one kernel (operators/topk.py):

* ``query_topk`` — distributed: segment rows for the query terms are read
  with bucket+term pushdown (partition-pruned scan), sliced per doc-id range
  along BLOCK boundaries (zero decode — the build's range-salted layout means
  every term's blocks are already range-ordered), then each range runs WAND
  independently inside ``applyInPandas`` and the global top-k is the merge of
  per-range top-ks (correct because a doc's entire score lives in one range).
  This is the 1000-executor path: ranges scale with n_salts.

* ``query_topk_local`` — driver-side: for interactive/p50-latency use; same
  kernel, lists fetched via the pruned scan and collected (query terms are
  few; postings stay compressed until the kernel skips through them).

idf = ln(1 + (N - df + 0.5)/(df + 0.5)); N, avgdl from stats.json.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.codec import EncodedPostings
from ..operators.topk import brute_force_topk, hybrid_topk, wand_topk
from . import manifest as mf
from .build import POSITIONS_READ_SCHEMA, _py_bucket


@dataclass
class IndexHandle:
    index_dir: str
    n_docs: int
    avgdl: float
    n_buckets: int
    n_salts: int
    # positional-store generation (0 = none/pre-versioning; 2 = +tok_ids);
    # see index/build.py POSITIONS_SCHEMA_VERSION
    positions_schema: int = 0
    # compaction generation of the append-mode stores (manifest.data_dir)
    generation: int = 0
    # sorted tombstoned doc_ids (delete_docs): every query path excludes
    # them until compact_index physically purges; loaded at handle creation
    tombstones: np.ndarray | None = None

    def __post_init__(self) -> None:
        # hot-postings cache for the interactive path: term → EncodedPostings
        # (None = term absent from the index). Real engines keep hot posting
        # lists resident; this is the single-node analog. The cache reflects
        # the index AS OF load_index()/invalidate() — call invalidate() (or
        # re-load_index) after merge_docs_into_index or delete_docs touches
        # this index.
        self._term_cache: dict[str, EncodedPostings | None] = {}
        if self.tombstones is None:
            from .build import read_tombstone_ids

            self.tombstones = read_tombstone_ids(self.index_dir)

    def invalidate(self) -> None:
        """Drop cached postings and reload tombstones (after an incremental
        merge or delete_docs touched this index)."""
        self._term_cache.clear()
        from .build import read_tombstone_ids

        self.tombstones = read_tombstone_ids(self.index_dir)

    @property
    def n_live_docs(self) -> int:
        """Documents visible to queries: n_docs minus tombstoned. Used for
        idf so scores drift toward the post-purge values immediately (df per
        term still counts tombstoned postings until compaction re-encodes —
        the standard deleted-docs approximation)."""
        return self.n_docs - int(self.tombstones.size)

    def _excluded(self) -> np.ndarray | None:
        return self.tombstones if self.tombstones.size else None

    @property
    def segments_path(self) -> str:
        return os.path.join(self.index_dir, "segments")

    @property
    def doc_map_path(self) -> str:
        return mf.data_dir(self.index_dir, "doc_map", self.generation)

    @property
    def positions_path(self) -> str:
        return mf.data_dir(self.index_dir, "positions", self.generation)


def load_index(index_dir: str) -> IndexHandle:
    stats = mf.read_stats(index_dir)
    return IndexHandle(
        index_dir=index_dir,
        n_docs=int(stats["n_docs"]),
        avgdl=float(stats["avgdl"]),
        n_buckets=int(stats["n_buckets"]),
        n_salts=int(stats["n_salts"]),
        positions_schema=int(stats.get("positions_schema", 0)),
        generation=int(stats.get("generation", 0)),
    )


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _segment_rows(spark: SparkSession, h: IndexHandle, terms: list[str]) -> DataFrame:
    from .build import SEGMENT_SCHEMA

    buckets = sorted({_py_bucket(t, h.n_buckets) for t in terms})
    return (
        # explicit schema: also serves a structurally-empty index (every doc
        # deleted + compacted) instead of failing schema inference
        spark.read.schema(SEGMENT_SCHEMA).parquet(h.segments_path)
        # bucket is the partition column → directory pruning; term is a
        # parquet min/max + dictionary pushdown on the sorted segment files
        .where(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
    )


def _row_to_encoded(row) -> EncodedPostings:
    return EncodedPostings(
        df=int(row["df"]),
        cf=int(row["cf"]),
        doc_bytes=bytes(row["doc_bytes"]),
        tf_bytes=bytes(row["tf_bytes"]),
        dl_bytes=bytes(row["dl_bytes"]),
        first_doc=np.asarray(row["first_doc"], dtype=np.int64),
        last_doc=np.asarray(row["last_doc"], dtype=np.int64),
        n=np.asarray(row["n"], dtype=np.int32),
        doc_off=np.asarray(row["doc_off"], dtype=np.int64),
        tf_off=np.asarray(row["tf_off"], dtype=np.int64),
        dl_off=np.asarray(row["dl_off"], dtype=np.int64),
        max_impact=np.asarray(row["max_impact"], dtype=np.float32),
    )


def _slice_encoded(enc: EncodedPostings, b0: int, b1: int) -> EncodedPostings:
    """Blocks [b0, b1) as a standalone EncodedPostings — byte slicing only."""
    d0 = int(enc.doc_off[b0])
    t0 = int(enc.tf_off[b0])
    l0 = int(enc.dl_off[b0])
    d1 = int(enc.doc_off[b1]) if b1 < enc.first_doc.size else len(enc.doc_bytes)
    t1 = int(enc.tf_off[b1]) if b1 < enc.first_doc.size else len(enc.tf_bytes)
    l1 = int(enc.dl_off[b1]) if b1 < enc.first_doc.size else len(enc.dl_bytes)
    n = enc.n[b0:b1]
    return EncodedPostings(
        df=int(n.sum()),
        cf=0,  # not needed at query time
        doc_bytes=enc.doc_bytes[d0:d1],
        tf_bytes=enc.tf_bytes[t0:t1],
        dl_bytes=enc.dl_bytes[l0:l1],
        first_doc=enc.first_doc[b0:b1],
        last_doc=enc.last_doc[b0:b1],
        n=n,
        doc_off=enc.doc_off[b0:b1] - d0,
        tf_off=enc.tf_off[b0:b1] - t0,
        dl_off=enc.dl_off[b0:b1] - l0,
        max_impact=enc.max_impact[b0:b1],
    )


def _read_segment_rows_arrow(h: IndexHandle, terms: list[str]) -> dict:
    """Driver-side pruned read of segment rows via pyarrow — no Spark job.
    Partition (bucket) dirs are pruned by the dataset filter; term equality
    is pushed to parquet row groups. ~10-30ms vs ~300ms for a Spark job."""
    import glob

    import pyarrow.dataset as ds

    if not glob.glob(os.path.join(h.segments_path, "bucket=*", "*.parquet")):
        return {}  # structurally-empty index (every doc deleted + compacted)
    buckets = sorted({_py_bucket(t, h.n_buckets) for t in terms})
    dataset = ds.dataset(h.segments_path, format="parquet", partitioning="hive")
    expr = ds.field("bucket").isin(buckets) & ds.field("term").isin(
        list(set(terms))
    )
    tbl = dataset.to_table(filter=expr)
    return {rec["term"]: rec for rec in tbl.to_pylist()}


def _collect_lists(
    spark: SparkSession, h: IndexHandle, terms: list[str]
) -> list[tuple[EncodedPostings, float]]:
    wanted = sorted(set(terms))  # canonical term order
    missing = [t for t in wanted if t not in h._term_cache]
    if missing:
        rows = _read_segment_rows_arrow(h, missing)
        for t in missing:
            h._term_cache[t] = (
                _row_to_encoded(rows[t]) if t in rows else None
            )
    lists = []
    for t in wanted:
        enc = h._term_cache[t]
        if enc is not None:
            lists.append((enc, idf(h.n_live_docs, enc.df)))
    return lists


def query_terms(text: str, lang: str = "en", lemmatizer=None) -> list[str]:
    """Tokenize a free-text query with the EXACT document tokenizer (same
    normalization, same lemmatizer seam, same ja/zh/ko/th character-bigram
    routing — textparse.cjk_parts), so query terms hit the index's term
    inventory by construction: ``query_terms('東京都', 'ja')`` →
    ``['東京', '京都']``. Pass the result to query_topk / query_topk_local."""
    from ..lemma import get_lemmatizer
    from ..textparse import extract_lines, tokenize_lines

    lem = get_lemmatizer(lemmatizer)
    if lem is not None and hasattr(lem, "for_lang"):
        lem = lem.for_lang(lang or "en")
    doc = tokenize_lines(extract_lines(text), lang=lang or "en", lemmatizer=lem)
    seen: dict[str, None] = {}
    for t in doc.tokens:
        seen.setdefault(t.term)
    return list(seen)


def query_topk_local(
    spark: SparkSession, h: IndexHandle, terms: list[str], k: int = 10
) -> list[tuple[int, float]]:
    """Driver-side retrieval (low-latency path): hybrid kernel — vectorized
    exact evaluation for small candidate volumes, block-max WAND above the
    crossover (both bit-identical, tests/test_topk.py)."""
    lists = _collect_lists(spark, h, terms)
    return hybrid_topk(lists, k, h.avgdl, excluded=h._excluded())


def query_topk(
    spark: SparkSession, h: IndexHandle, terms: list[str], k: int = 10
) -> DataFrame:
    """Distributed WAND: per doc-id range partial top-k, global merge.
    Returns DataFrame (doc_id long, score double, rank int)."""
    n_docs, avgdl, n_salts = h.n_live_docs, h.avgdl, h.n_salts
    excluded = h._excluded()  # closure-captured; ships with the tasks
    terms_sorted = sorted(set(terms))
    seg = _segment_rows(spark, h, terms_sorted)

    # range boundaries = the build's salt ranges (signed int64 space)
    bits = n_salts.bit_length() - 1
    if n_salts == 1:
        lows = [-(1 << 63)]
    else:
        lows = [((s - n_salts // 2) << (64 - bits)) for s in range(n_salts)]
    bounds = lows[1:] + [1 << 63]

    df_by_term = {
        r["term"]: int(r["df"])
        for r in seg.select("term", "df").collect()
    }
    idfs = {t: idf(n_docs, df_by_term[t]) for t in terms_sorted if t in df_by_term}
    term_order = {t: i for i, t in enumerate(terms_sorted)}

    def slice_ranges(it):
        for pdf in it:
            out = []
            for rec in pdf.to_dict("records"):
                enc = _row_to_encoded(rec)
                # block index boundaries per salt range (first_doc sorted)
                for s in range(n_salts):
                    lo = lows[s]
                    hi = bounds[s]
                    b0 = int(np.searchsorted(enc.last_doc, lo, side="left"))
                    b1 = int(np.searchsorted(enc.first_doc, hi, side="left"))
                    if b0 >= b1:
                        continue
                    sl = _slice_encoded(enc, b0, b1)
                    out.append(
                        {
                            "range_id": s,
                            "term": rec["term"],
                            "df_global": rec["df"],
                            "doc_bytes": sl.doc_bytes,
                            "tf_bytes": sl.tf_bytes,
                            "dl_bytes": sl.dl_bytes,
                            "first_doc": sl.first_doc.tolist(),
                            "last_doc": sl.last_doc.tolist(),
                            "n": sl.n.tolist(),
                            "doc_off": sl.doc_off.tolist(),
                            "tf_off": sl.tf_off.tolist(),
                            "dl_off": sl.dl_off.tolist(),
                            "max_impact": sl.max_impact.tolist(),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "range_id", "term", "df_global", "doc_bytes", "tf_bytes",
                    "dl_bytes", "first_doc", "last_doc", "n", "doc_off",
                    "tf_off", "dl_off", "max_impact",
                ],
            )

    slice_schema = (
        "range_id int, term string, df_global long, "
        "doc_bytes binary, tf_bytes binary, dl_bytes binary, "
        "first_doc array<long>, last_doc array<long>, n array<int>, "
        "doc_off array<long>, tf_off array<long>, dl_off array<long>, "
        "max_impact array<float>"
    )
    slices = seg.mapInPandas(slice_ranges, schema=slice_schema)

    def wand_range(pdf: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(
            pdf.to_dict("records"), key=lambda r: term_order[r["term"]]
        )
        lists = []
        for rec in recs:
            enc = EncodedPostings(
                df=int(sum(rec["n"])),
                cf=0,
                doc_bytes=bytes(rec["doc_bytes"]),
                tf_bytes=bytes(rec["tf_bytes"]),
                dl_bytes=bytes(rec["dl_bytes"]),
                first_doc=np.asarray(rec["first_doc"], dtype=np.int64),
                last_doc=np.asarray(rec["last_doc"], dtype=np.int64),
                n=np.asarray(rec["n"], dtype=np.int32),
                doc_off=np.asarray(rec["doc_off"], dtype=np.int64),
                tf_off=np.asarray(rec["tf_off"], dtype=np.int64),
                dl_off=np.asarray(rec["dl_off"], dtype=np.int64),
                max_impact=np.asarray(rec["max_impact"], dtype=np.float32),
            )
            lists.append((enc, idfs[rec["term"]]))
        top = hybrid_topk(lists, k, avgdl, excluded=excluded)
        return pd.DataFrame(top, columns=["doc_id", "score"])

    partial = slices.groupBy("range_id").applyInPandas(
        wand_range, schema="doc_id long, score double"
    )
    w_ordered = partial.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return w_ordered.withColumn("rank", F.row_number().over(w))


def _without_tombstones(spark: SparkSession, h: IndexHandle, df: DataFrame) -> DataFrame:
    """Anti-join a doc_id DataFrame against the handle's tombstones (no-op
    when none). The deleted set is broadcast — it is small by contract
    (compaction empties it)."""
    if h.tombstones is None or h.tombstones.size == 0:
        return df
    tomb = spark.createDataFrame(
        [(int(d),) for d in h.tombstones], "doc_id long"
    )
    return df.join(F.broadcast(tomb), "doc_id", "left_anti")


def snippet_lookup(
    spark: SparkSession,
    h: IndexHandle,
    lines: DataFrame,
    topk: DataFrame,
) -> DataFrame:
    """J2 (gui.py:757-766): join ranked doc ids back to their source lines via
    the doc_map — the words-in-context example fetch."""
    doc_map = spark.read.parquet(h.doc_map_path)
    # broadcast the k-row topk side, never the corpus-sized doc_map
    return (
        F.broadcast(topk).join(doc_map, "doc_id")
        .join(lines, "url")
        .select("doc_id", "url", "rank", "score", "line_id", "line")
    )


def brute_force_query_local(
    spark: SparkSession, h: IndexHandle, terms: list[str], k: int = 10
) -> list[tuple[int, float]]:
    """Oracle twin of query_topk_local (decode-everything scorer)."""
    lists = _collect_lists(spark, h, terms)
    return brute_force_topk(lists, k, h.avgdl, excluded=h._excluded())


def occurrences(
    spark: SparkSession, h: IndexHandle, doc_ids: list[int], terms: list[str]
) -> DataFrame:
    """Positional lookup (the reference's ``word_occ_ids``,
    extract_words.py:421): per (doc, term), the ordered line/cue indices of
    every occurrence. Requires the index to have been built
    ``with_positions=True``. Bucket-pruned scan, same layout as segments."""
    path = h.positions_path
    buckets = sorted({_py_bucket(t, h.n_buckets) for t in terms})
    return _without_tombstones(
        spark,
        h,
        spark.read.schema(POSITIONS_READ_SCHEMA).parquet(path)
        .where(
            F.col("bucket").isin(buckets)
            & F.col("term").isin(terms)
            & F.col("doc_id").isin([int(d) for d in doc_ids])
        )
        .select("doc_id", "term", "line_ids"),
    )


def cooccurrence_topk(
    spark: SparkSession, h: IndexHandle, terms: list[str], k: int = 10
) -> DataFrame:
    """Same-line co-occurrence retrieval over the positional store: documents
    ranked by the number of lines where ALL query terms appear together —
    the index-backed form of the reference's words-in-context semantics
    (terms sharing a cue). Requires ``with_positions=True`` at build time.

    (doc_id, n_lines, line_ids, rank); ties by doc_id. Pure DataFrame ops:
    pruned positional scan → explode line ids → per-(doc, line) distinct-term
    count → filter count == |terms| → per-doc aggregation → top-k."""
    terms = sorted(set(terms))
    path = h.positions_path
    buckets = sorted({_py_bucket(t, h.n_buckets) for t in terms})
    occ = _without_tombstones(
        spark,
        h,
        spark.read.schema(POSITIONS_READ_SCHEMA).parquet(path)
        .where(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
        .select("doc_id", "term", F.explode("line_ids").alias("line_id"))
        .distinct(),
    )
    lines_with_all = (
        occ.groupBy("doc_id", "line_id")
        .agg(F.countDistinct("term").alias("n_terms"))
        .where(F.col("n_terms") == len(terms))
    )
    per_doc = lines_with_all.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.array_sort(F.collect_list("line_id")).alias("line_ids"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_lines"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "n_lines", "line_ids", "rank")
    )


def phrase_matches_index(
    spark: SparkSession, h: IndexHandle, phrase: list[str]
) -> DataFrame:
    """Exact phrase occurrences served FROM the positional store — no
    re-tokenization of the corpus. (doc_id, start_pos) per occurrence, where
    start_pos is the doc-local token ordinal of the phrase's first term
    (``tok_ids`` written at build/merge time; line_ids remain the cue-level
    wsid analog, extract_words.py:195-196).

    Plan: bucket-pruned positional scan per phrase term (term equality pushes
    to the parquet scan), then a chain of doc_id-co-partitioned joins that
    intersects each term's token-position array shifted by its phrase offset
    — per-doc work is array intersection of postings-sized lists, never a
    token-table join. Token ordinals are continuous across cue boundaries,
    matching the SQL-path semantics (operators/phrase.py over posexplode
    positions); equality of the two paths is pinned in tests."""
    if not phrase:
        raise ValueError("empty phrase")
    path = h.positions_path
    if h.positions_schema < 2:
        # Grace check for tok_ids-era stores whose stats.json predates the
        # positions_schema key (loads as 0): if every row in fact carries
        # tok_ids, stamp v2 and proceed — such indexes were valid all along.
        # The hard error stays for genuine v1 stores, where a plain read
        # would silently drop pre-upgrade documents from phrase results.
        from .build import POSITIONS_SCHEMA_VERSION

        probe = spark.read.option("mergeSchema", "true").parquet(path)
        if "tok_ids" in probe.columns and (
            probe.where(F.col("tok_ids").isNull()).limit(1).count() == 0
        ):
            # stamp the IN-MEMORY handle only: a query path must not
            # read-modify-write stats.json (a concurrent merge/compaction
            # updating stats between our read and write would be clobbered
            # by the stale copy). The durable stamp belongs to maintenance
            # ops — compact_index writes it under the atomic replace.
            h.positions_schema = POSITIONS_SCHEMA_VERSION
        else:
            raise ValueError(
                "index positional store predates tok_ids (positions_schema "
                f"{h.positions_schema} < 2); rebuild with_positions=True to "
                "enable index-backed phrase search"
            )
    buckets = sorted({_py_bucket(t, h.n_buckets) for t in set(phrase)})
    pos = _without_tombstones(
        spark,
        h,
        spark.read.schema(POSITIONS_READ_SCHEMA).parquet(path)
        .where(F.col("bucket").isin(buckets) & F.col("term").isin(list(set(phrase))))
        .select("doc_id", "term", "tok_ids"),
    )
    anchor = pos.where(F.col("term") == phrase[0]).select(
        "doc_id", F.col("tok_ids").alias("starts")
    )
    for i, t in enumerate(phrase[1:], start=1):
        nxt = pos.where(F.col("term") == t).select(
            "doc_id",
            F.transform("tok_ids", lambda x: x - i).alias("shifted"),
        )
        anchor = (
            anchor.join(nxt, "doc_id")
            .select(
                "doc_id",
                F.array_intersect("starts", "shifted").alias("starts"),
            )
            .where(F.size("starts") > 0)
        )
    return anchor.select(
        "doc_id", F.explode("starts").alias("start_pos")
    )
