"""Deduplication operators for large-scale training-data pipelines.

Four families, each a composition of built-in DataFrame ops (no UDFs in the
hot path — everything is JVM-side and shuffle-aware):

  * exact          — md5(normalized text) groupBy; keep min doc_id
  * minhash + LSH  — word shingles → md5-permutation minima → banded LSH
                     bucket join → candidate pairs (+ exact-jaccard verify)
  * simhash        — per-bit weighted majority over term md5 bits
  * n-gram jaccard — shared-shingle candidate join → |∩|/|∪|

Determinism & portability: every hash is md5-hex (identical in Spark and
DuckDB), minima are LEXICOGRAPHIC over hex strings (portable MinHash
permutations: md5(i || '|' || shingle)), so the driver's oracle comparison is
exact — no engine-specific hash functions anywhere.

Scale notes: the LSH band join is the scale path (candidates only meet inside
a band bucket — no n² pair space); the plain shingle join variant is the
small-scale oracle twin. Shingle explosion is bounded by SHINGLE_K words per
shingle and distinct-per-doc dedup before joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_K = 3  # words per shingle
N_HASHES = 12  # minhash signature length
BAND_SIZE = 2  # rows per band → 6 bands
JACCARD_THRESHOLD = 0.5


def normalized_text(col):
    """Dedup normalization: lowercase, collapse non-letter runs to one space."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^\p{L}]+", " "))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(digest, keep_id, n_dups): one row per distinct normalized text."""
    return (
        docs.select(
            F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("digest")
        )
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             k: int = SHINGLE_K) -> DataFrame:
    """Distinct word-k-gram shingles per doc: (id, shingle)."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k))
    )
    return (
        docs.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .where(F.size(F.split(F.col("shingle"), " ")) == k)
        .distinct()
    )


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id",
                       n_hashes: int = N_HASHES) -> DataFrame:
    """(id, h, minhash): lexicographic md5 minima under n_hashes portable
    'permutations' (salted md5)."""
    hs = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("h")
    return (
        sh.select(F.col(id_col), hs, "shingle")
        .withColumn(
            "hval",
            F.md5(F.concat_ws("|", F.col("h").cast("string"), F.col("shingle"))),
        )
        .groupBy(id_col, "h")
        .agg(F.min("hval").alias("minhash"))
    )


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """Band the signatures, bucket-join within bands → candidate (a, b) pairs
    (a < b). The join key is md5(band || concatenated minima) — collision
    space is per-band, never all-pairs."""
    banded = (
        sig.withColumn("band", (F.col("h") / band_size).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(",", F.sort_array(F.collect_list(
                    F.concat_ws(":", F.col("h").cast("string"), "minhash")
                )))
            ).alias("bucket")
        )
    )
    left = banded.select(
        F.col(id_col).alias("a"), "band", "bucket"
    )
    right = banded.select(
        F.col(id_col).alias("b"), "band", "bucket"
    )
    return (
        left.join(right, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = JACCARD_THRESHOLD,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs: (a, b, inter, union_size,
    jaccard). With ``candidates`` (e.g. lsh_candidate_pairs — the scale
    path), the intersection is computed by expanding each candidate pair
    with a-side shingles and probing the b-side on (b, shingle): work is
    O(|candidates| × shingles-per-doc), never the shared-shingle self-join
    whose hot shingles ("one of the") create a quadratic, skewed pair space.
    Without candidates (small-scale exact form / oracle twin) it falls back
    to that self-join."""
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    if candidates is not None:
        inter = (
            candidates.join(a, "a")
            .join(b, ["b", "shingle"], "left_semi")
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        inter = (
            a.join(b, "shingle")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed(id_col, "b").withColumnRenamed("sz", "sz_b"), "b")
        .withColumn("union_size", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .withColumn(
            "jaccard", F.round(F.col("inter") / F.col("union_size"), 6)
        )
    )
    return out.where(F.col("jaccard") >= threshold).select(
        "a", "b", "inter", "union_size", "jaccard"
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            n_bits: int = 32) -> DataFrame:
    """(id, simhash string of 0/1): weighted per-bit majority over the md5
    bits of each distinct term (weight = tf). Bit j of a term = high bit of
    the j-th hex nibble of md5(term) — portable to SQL via substr+IN."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    tf = (
        docs.select(F.col(id_col), F.explode(words).alias("term"))
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("hash", F.md5("term"))
    )
    bits = tf.select(
        id_col,
        "tf",
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("j"),
        "hash",
    ).withColumn(
        "vote",
        F.when(
            F.substring("hash", F.col("j") + 1, 1).isin(
                "8", "9", "a", "b", "c", "d", "e", "f"
            ),
            F.col("tf"),
        ).otherwise(-F.col("tf")),
    )
    return (
        bits.groupBy(id_col, "j")
        .agg(F.sum("vote").alias("v"))
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("j", F.when(F.col("v") > 0, "1").otherwise("0").alias("bit")))
                    ),
                    lambda s: s.bit,
                ),
            ).alias("simhash")
        )
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster the near-duplicate pair graph: (node, component), component =
    the minimum node id in the connected component — the canonical-document
    assignment a dedup pipeline needs after pair verification (keep the
    component min, drop the rest).

    Min-label propagation as an iterative DataFrame loop: each round every
    node takes min(own label, neighbors' labels); stop when a round changes
    nothing (convergence is exact — labels only decrease and the min is a
    fixpoint). Rounds needed = graph diameter, which for near-dup clusters
    is small (similarity is near-transitive, so components are dense); the
    localCheckpoint per round truncates the growing lineage. For adversarial
    long-chain graphs at 10^12 scale use ``connected_components_star`` below
    (O(log n) rounds regardless of diameter; property-tested equal). The
    propagation form is kept as the default because it is exactly
    SQL-expressible (the DuckDB oracle replays it as a recursive
    transitive-closure CTE) and its per-round cost is one shuffle on node.

    Raises RuntimeError if ``max_iter`` rounds pass without convergence —
    returning partial (unconverged) labels would silently split components.
    """
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter or use "
            "connected_components_star (O(log n) rounds)"
        )
    edges.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("component"))


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its strictly-larger
    neighbors to the minimum of its neighborhood (Kiveris et al. 2014,
    'Connected Components in MapReduce and Beyond', alg. 2)."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
    )
    return (
        sym.where(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node connects its smaller neighbors (and
    itself) to the minimum of that set (Kiveris et al. 2014, alg. 3)."""
    e = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    joined = e.join(mins, "u")
    return (
        joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(joined.select("u", "m").toDF("u", "v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) via alternating large-star/small-star contraction
    (Kiveris et al. 2014): converges in O(log n) rounds on ANY graph shape —
    the scale path for adversarial long-diameter pair graphs where min-label
    propagation needs diameter rounds. Same contract as
    ``connected_components`` (component = min node id; property-tested equal
    on random graphs and long chains, tests/test_pipeline_ops.py); each
    round is two shuffles (neighborhood min-agg + emit), lineage truncated
    per round with localCheckpoint. At convergence the edge set is a star
    forest (node → component min); nodes that appear only in self-pairs
    label themselves."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    edges = edges.where(F.col("u") != F.col("v"))
    n_edges = edges.count()
    for _ in range(max_iter):
        new_edges = _small_star(_large_star(edges)).localCheckpoint()
        n_new = new_edges.count()
        if n_new == n_edges and (
            new_edges.exceptAll(edges).limit(1).count() == 0
        ):
            edges = new_edges
            break
        edges, n_edges = new_edges, n_new
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — unexpected for O(log n) contraction; check the pair "
            "graph for pathological size or raise max_iter"
        )
    return nodes.join(
        edges, nodes["node"] == edges["u"], "left"
    ).select(
        "node", F.coalesce(F.col("v"), F.col("node")).alias("component")
    )


def near_dup_drop_list(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
    components_fn=connected_components_star,
) -> DataFrame:
    """The full near-dup pruning chain as one operator: shingles → MinHash
    signatures → banded LSH candidates → exact-Jaccard verify → connected
    components → every NON-CANONICAL member (node != component min) as a
    one-column drop list. This is the ``keep the component min, drop the
    rest`` policy a dedup-driven index prune needs — feed the result to
    ``index.build.delete_docs`` (id_col='url') and compact (the ST4
    takedown flow; end-to-end equality with a batch build over the keep-set
    is pinned in tests/test_streaming.py). Ids need only be orderable:
    string urls pick the lexicographically smallest member as canonical.
    ``components_fn``: connected_components_star (default — O(log n) rounds
    on ANY graph diameter, so the production prune path cannot hit the
    propagation variant's max-iteration bound on an adversarial long-chain
    dup graph) or connected_components (min-label propagation,
    diameter-bounded rounds; raises rather than returning unconverged
    labels). The two are property-tested equal on random and chain graphs
    (tests/test_pipeline_ops.py)."""
    sh = shingles(docs, id_col=id_col, text_col=text_col)
    sig = minhash_signatures(sh, id_col=id_col)
    cand = lsh_candidate_pairs(sig, id_col=id_col)
    pairs = jaccard_pairs(
        sh, id_col=id_col, threshold=threshold, candidates=cand
    )
    comp = components_fn(pairs)
    return comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
