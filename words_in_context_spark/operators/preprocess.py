"""Training-data preprocessing operators: PII scrubbing, deterministic
dataset splits, sequence packing.

The steps between corpus hygiene (dedup/quality, operators/dedup.py,
operators/textquality.py) and the tokenizer: scrub contact information,
assign stable train/val/test splits, and pack documents into fixed-size
context windows. All pure built-in expressions (JVM-side, RE2-safe regexes
shared verbatim with the DuckDB oracles)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# RE2-safe (no backrefs/lookaround) and byte-identical between Spark's Java
# regex and DuckDB's RE2: character classes, bounded repetition only.
EMAIL_PAT = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_PAT = r"555-[0-9]{4}"
IP_PAT = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact contact PII (emails, phone numbers, IPv4 addresses) with typed
    placeholders and report per-document counts:
    (id, n_emails, n_phones, n_ips, scrubbed_digest).

    Replacement order matters and is part of the contract: IP before phone
    (a phone pattern can never match inside an IP here, but pinning the
    order keeps the digest deterministic), email first (an email never
    contains the other two after substitution)."""
    text = F.col(text_col)
    n_emails = F.regexp_count(text, F.lit(EMAIL_PAT))
    n_phones = F.regexp_count(text, F.lit(PHONE_PAT))
    n_ips = F.regexp_count(text, F.lit(IP_PAT))
    scrubbed = F.regexp_replace(text, EMAIL_PAT, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, IP_PAT, "<IP>")
    scrubbed = F.regexp_replace(scrubbed, PHONE_PAT, "<PHONE>")
    return docs.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        F.md5(scrubbed).alias("scrubbed_digest"),
    )


def split_assign(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic, engine-portable train/val/test assignment:
    bucket = first hex digit of md5(id as string) → 16 stable buckets;
    0-b → train (75 %), c-d → val (12.5 %), e-f → test (12.5 %).
    (id, bucket_hex, split). Stable across runs, engines, and partitioning
    — the property a reproducible training pipeline needs (re-crawls keep
    documents in their split)."""
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    split = (
        F.when(bucket < "c", "train")
        .when(bucket < "e", "val")
        .otherwise("test")
    )
    return docs.select(
        F.col(id_col),
        bucket.alias("bucket_hex"),
        split.alias("split"),
    )


def sequence_packing(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack documents into fixed-size context windows (the LLM-training
    sequence-packing step): documents are concatenated in id order within a
    shard and cut every ``budget`` tokens; a document's bin is the window
    containing its START offset (standard concat-and-cut packing — a doc
    may straddle into the next window).

    (id, shard, n_tokens, start_offset, bin). Sharding (id % n_shards)
    bounds every window partition — the global-order single-partition
    window this would otherwise need is exactly what does NOT scale; real
    pipelines pack per shard/file, and n_shards maps to the cluster's
    write parallelism. The default therefore DERIVES from the input
    (max(input partitions, defaultParallelism) — a fixed small default
    would cap the packing sort at that many tasks regardless of cluster
    size); pass n_shards explicitly for a pinned, run-portable layout
    (the driver-battery entry pins 8). Offsets/bins are only comparable
    between runs that used the same n_shards — a doc's shard, and hence
    its neighbors in the concat order, change with the shard count."""
    if n_shards is None:
        sc = docs.sparkSession.sparkContext
        n_shards = max(docs.rdd.getNumPartitions(), sc.defaultParallelism)
    toks = F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^\p{L}]+"),
            lambda w: w != "",
        )
    )
    shard = (F.col(id_col) % n_shards).cast("int")
    base = docs.select(
        F.col(id_col), shard.alias("shard"), toks.alias("n_tokens")
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    start = (
        F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).cast("long")
    return base.select(
        id_col,
        "shard",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / budget).cast("long").alias("bin"),
    )
