"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact baseline, pure built-in expressions
    (zip_with + aggregate fold: JVM-side, codegen'd; no Python);
  * LSH-bucketed ANN — the scale path: signed random hyperplane sketches
    (seeded, deterministic) → Hamming-bucket candidates → exact re-rank
    within buckets. At 10^9+ vectors the bucket join replaces the n² cross
    product; probes = multi-bucket lookup.

Embedding-cosine near-duplicate detection composes the same primitives.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_knn(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.
    (q_id, vec_id, cos, rank) — cos rounded to 6dp BEFORE ranking so ranks
    are reproducible across engines; broadcast the (small) query side."""
    v = vectors.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    q = queries.select(F.col(q_id_col), as_double(F.col(q_vec_col)).alias("q"))
    scored = (
        v.crossJoin(F.broadcast(q))
        .withColumn("cos", F.round(cosine(F.col("v"), F.col("q")), 6))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id_col, id_col, "cos", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    """Deterministic signed random projections (public LSH construction)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_sketch(
    vectors: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sketch string of sign bits). Planes ship as a literal array —
    tiny, broadcast with the plan itself."""
    planes_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in p]) for p in planes]
    )
    v = as_double(F.col(vec_col))
    sk = F.concat_ws(
        "",
        F.transform(
            planes_lit,
            lambda p: F.when(_dot(v, p) >= 0, "1").otherwise("0"),
        ),
    )
    return vectors.select(F.col(id_col), sk.alias("sketch"))


def ann_knn_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    band_size: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 LSH band with the query, then
    exact cosine re-rank within candidates. Recall < 1 by construction; the
    brute-force path is the oracle."""
    planes = hyperplanes(dim, n_planes, seed)
    vs = lsh_sketch(vectors, planes, id_col, vec_col)
    qs = lsh_sketch(
        queries.select(F.col(q_id_col).alias(id_col), F.col(q_vec_col).alias(vec_col)),
        planes,
        id_col,
        vec_col,
    ).withColumnRenamed(id_col, q_id_col)

    n_bands = n_planes // band_size
    def banded(df, idc):
        return df.select(
            idc,
            F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
            F.col("sketch"),
        ).withColumn(
            "bucket", F.substring("sketch", F.col("band") * band_size + 1, band_size)
        ).drop("sketch")

    cand = (
        banded(vs, id_col)
        .join(banded(qs, q_id_col), ["band", "bucket"])
        .select(q_id_col, id_col)
        .distinct()
    )
    v = vectors.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    q = queries.select(F.col(q_id_col), as_double(F.col(q_vec_col)).alias("q"))
    scored = (
        cand.join(v, id_col)
        .join(F.broadcast(q), q_id_col)
        .withColumn("cos", F.round(cosine(F.col("v"), F.col("q")), 6))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id_col, id_col, "cos", "rank")
    )


def near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (a < b, cos ≥ threshold).
    Small-scale exact form; the LSH candidate join replaces the self cross
    join at scale (same re-rank)."""
    v = vectors.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    a = v.select(F.col(id_col).alias("a"), F.col("v").alias("va"))
    b = v.select(F.col(id_col).alias("b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def near_dup_pairs_lsh(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    band_size: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> DataFrame:
    """Scale path for embedding-cosine near-duplicates: candidate pairs share
    ≥1 LSH band (bucketed self-join — the pair space is per-bucket, never
    n²), then exact cosine re-rank + threshold. Same output schema as
    near_dup_pairs, whose all-pairs form is the exact oracle twin.

    Defaults (16 planes, 4-bit bands → 4 bands) give a miss probability of
    ~1e-3 per true pair at cos ≥ 0.95 — tighten bands/planes per threshold."""
    planes = hyperplanes(dim, n_planes, seed)
    sk = lsh_sketch(vectors, planes, id_col, vec_col)
    n_bands = n_planes // band_size
    banded = sk.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        F.substring(
            "sketch",
            F.col("band") * band_size + 1,
            band_size,
        ).alias("bucket"),
    )
    cand = (
        banded.select(F.col(id_col).alias("a"), "band", "bucket")
        .join(banded.select(F.col(id_col).alias("b"), "band", "bucket"),
              ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    v = vectors.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    return (
        cand.join(v.select(F.col(id_col).alias("a"), F.col("v").alias("va")), "a")
        .join(v.select(F.col(id_col).alias("b"), F.col("v").alias("vb")), "b")
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probed-cell re-rank —
# the second scale path (LSH above). At 10^9+ vectors the cell assignment is
# a narrow map against broadcast centroids and each query touches only
# n_probes cells' postings.
# ---------------------------------------------------------------------------


def _centroid_lit(centroids: list[list[float]]):
    return F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])


def ivf_train(
    vectors: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd iterations as DataFrame ops: init = the vectors
    with the n_centroids smallest ids (seed-free, reproducible), then
    assign (broadcast centroids, argmax cosine) → per-cell mean."""
    v = vectors.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    init = (
        v.orderBy(id_col).limit(n_centroids).select("v").collect()
    )
    centroids = [row["v"] for row in init]
    for _ in range(n_iters):
        assigned = _ivf_assign_df(v, centroids)
        rows = (
            assigned.groupBy("cell")
            .agg(
                F.array(
                    *[
                        F.avg(F.col("v")[i]).alias(f"c{i}")
                        for i in range(len(centroids[0]))
                    ]
                ).alias("centroid")
            )
            .collect()
        )
        by_cell = {r["cell"]: list(r["centroid"]) for r in rows}
        centroids = [
            by_cell.get(i, centroids[i]) for i in range(n_centroids)
        ]
    return centroids


def _ivf_assign_df(v: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(id_col, v, cell): nearest centroid by cosine (ties → lowest cell id).
    One narrow pass: per-centroid cosines inside an array expression, argmax
    via array_position on the max (first match wins ties)."""
    sims = F.transform(
        _centroid_lit(centroids), lambda c: cosine(F.col("v"), c)
    )
    return v.withColumn("_sims", sims).withColumn(
        "cell",
        (F.array_position(F.col("_sims"), F.array_max(F.col("_sims"))) - 1).cast(
            "int"
        ),
    ).drop("_sims")


def ann_knn_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF retrieval: assign vectors to cells once, probe the n_probes
    nearest cells per query, exact cosine re-rank within candidates.
    Output schema matches brute_force_knn (its oracle twin in tests).

    Probe-cell selection is DISTRIBUTED (centroids ship as literals inside
    the plan; per-query top-n_probes cells via an array-sort expression) —
    a query *table* of any size works; nothing is collected to the driver."""
    v = vectors.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    if centroids is None:
        centroids = ivf_train(vectors, n_centroids, id_col=id_col, vec_col=vec_col)
    assigned = _ivf_assign_df(v, centroids)

    qv = queries.select(
        F.col(q_id_col), as_double(F.col(q_vec_col)).alias("q")
    )
    sims = F.transform(_centroid_lit(centroids), lambda c: cosine(F.col("q"), c))
    # rank cells by similarity desc (tie → lower cell id): sort (-sim, cell)
    # structs ascending, take the first n_probes cell ids
    cells = F.transform(
        F.slice(
            F.array_sort(
                F.zip_with(
                    sims,
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")),
                )
            ),
            1,
            n_probes,
        ),
        lambda x: x.cell,
    )
    probes = qv.select(q_id_col, F.explode(cells).alias("cell"))

    cand = assigned.join(F.broadcast(probes), "cell").select(q_id_col, id_col, "v")
    q = queries.select(F.col(q_id_col), as_double(F.col(q_vec_col)).alias("q"))
    scored = cand.join(F.broadcast(q), q_id_col).withColumn(
        "cos", F.round(cosine(F.col("v"), F.col("q")), 6)
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id_col, id_col, "cos", "rank")
    )
