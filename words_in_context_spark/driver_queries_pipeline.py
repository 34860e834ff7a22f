"""Driver-contract battery #2: training-data pipeline operators.

Dedup (exact / MinHash+LSH / SimHash / n-gram Jaccard), similarity search
(brute-force cosine + LSH ANN), text analysis (lang-id, quality, token
counts, fingerprints), multimodal metadata, sessionization.

The documents table has no natural duplicates, so dedup queries run over
``documents ∪ perturbed(documents)``: docs with doc_id < 40 are re-emitted at
doc_id+100000 with their first three words dropped — a deterministic
near-duplicate construction expressed identically in Spark and the DuckDB
oracle (so candidate/verify results are non-vacuous and exactly comparable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup, similarity, textquality


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the DuckDB oracle compares timestamps as naive-UTC strings; pin the
    # session TZ here so results don't depend on the caller's session config
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_with_dups(spark, sf_dir) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    perturbed = (
        docs.where(F.col("doc_id") < 40)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat_ws(" ", F.slice(words, 4, 1_000_000)).alias("text"),
        )
    )
    return docs.unionByName(perturbed)


_DUPS_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         array_to_string(
           (string_split(text, ' '))[4:greatest(len(string_split(text, ' ')), 4)],
           ' ') AS text
  FROM documents WHERE doc_id < 40
"""

_NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'))"


def _planes_values_sql(dim: int, n_planes: int, seed: int = 13) -> str:
    """The seeded LSH hyperplanes as a DuckDB VALUES list — the planes are a
    deterministic function of (dim, n_planes, seed), so inlining them makes
    the LSH candidate generation exactly SQL-expressible (repr(float) round-
    trips to the identical double in both engines)."""
    from .operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes, seed)
    rows = ",\n            ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in p)}])"
        for i, p in enumerate(planes)
    )
    return f"(SELECT * FROM (VALUES {rows}) AS t(p, plane))"


_EMB_DIM = 64  # all testdata sf dirs ship 64-d embeddings

# shingles CTE (word 3-grams, distinct per doc) — twin of dedup.shingles
_SHINGLES_SQL = f"""
  WITH dd AS ({_DUPS_SQL}),
  arrs AS (
    SELECT doc_id, string_split({_NORM_SQL}, ' ') AS arr FROM dd
  ),
  pos AS (
    SELECT doc_id, arr, unnest(generate_series(1, greatest(len(arr) - 2, 1))) AS i
    FROM arrs
  ),
  sh0 AS (
    SELECT doc_id, array_to_string(arr[i:i+2], ' ') AS shingle FROM pos
  )
  SELECT DISTINCT doc_id, shingle FROM sh0
  WHERE len(string_split(shingle, ' ')) = 3
"""


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: md5(normalized text) hash-groupBy, keep min doc_id."""
    return dedup.exact_dedup(_docs_with_dups(spark, sf_dir))


def q_shingles(spark, sf_dir):
    """Shingle extraction (the dedup primitive): distinct word 3-grams."""
    return dedup.shingles(_docs_with_dups(spark, sf_dir))


def q_minhash_signatures(spark, sf_dir):
    """Portable MinHash: per (doc, hash-permutation) lexicographic md5 min."""
    sh = dedup.shingles(_docs_with_dups(spark, sf_dir))
    return dedup.minhash_signatures(sh)


def q_minhash_lsh_pairs(spark, sf_dir):
    """LSH candidate pairs: banded signature bucket join (the scale path —
    candidates meet only inside band buckets, never all-pairs)."""
    sh = dedup.shingles(_docs_with_dups(spark, sf_dir))
    sig = dedup.minhash_signatures(sh)
    return dedup.lsh_candidate_pairs(sig)


def q_jaccard_dedup(spark, sf_dir):
    """Exact n-gram Jaccard ≥ 0.5, verified over LSH candidate pairs (the
    scale path: a hot shingle never creates a quadratic pair space — only
    banded-signature bucket collisions are verified)."""
    sh = dedup.shingles(_docs_with_dups(spark, sf_dir))
    sig = dedup.minhash_signatures(sh)
    return dedup.jaccard_pairs(sh, candidates=dedup.lsh_candidate_pairs(sig))


def q_simhash(spark, sf_dir):
    """32-bit SimHash per document (tf-weighted per-bit majority)."""
    return dedup.simhash(_docs_with_dups(spark, sf_dir))


def q_dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERING: connected components over the LSH-verified
    Jaccard pair graph (canonical-doc assignment: cluster id = component min
    doc_id). Iterative min-label propagation as DataFrame rounds; the
    oracle replays it as a recursive transitive-closure CTE."""
    sh = dedup.shingles(_docs_with_dups(spark, sf_dir))
    sig = dedup.minhash_signatures(sh)
    pairs = dedup.jaccard_pairs(sh, candidates=dedup.lsh_candidate_pairs(sig))
    return dedup.connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster")
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 for 5 fixed query vectors (exact baseline)."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return similarity.brute_force_knn(emb.where(F.col("vec_id") >= 5), queries)


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN (scale path). The seeded hyperplanes are inlined
    into the DuckDB oracle as literals, so the band-bucket candidate join +
    exact re-rank is compared exactly. Recall vs the brute-force twin is
    additionally pinned in tests/test_pipeline_ops.py."""
    emb = _read(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return similarity.ann_knn_lsh(
        emb.where(F.col("vec_id") >= 5), queries, dim=dim
    )


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN (second scale path): k-means coarse quantizer, 4-probe cell
    lookup, exact re-rank. The oracle replays the ENTIRE deterministic
    training in SQL (_ivf_oracle_sql: init = n_centroids smallest vec_ids,
    3 Lloyd iterations as chained CTEs) — training is seed-free and
    fixed-iteration (operators/similarity.ivf_train), so the two engines
    converge to the same centroids up to summation-order ulps, which the
    huge argmax margins of random embeddings absorb; the output cos is exact
    re-rank against the raw vectors either way. Full-probe==brute-force
    exactness is additionally pinned in tests/test_pipeline_ops."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return similarity.ann_knn_ivf(
        emb.where(F.col("vec_id") >= 5), queries, k=10,
        n_centroids=8, n_probes=4,
    )


# (The former ann_ivf_full_topk battery entry — IVF with n_probes ==
# n_centroids, identical to brute-force by construction — moved to pytest
# only: tests/test_pipeline_ops.py::test_ivf_ann_recall_and_exactness pins
# full-probe == brute force, and ann_ivf_topk above retains the exact
# replayed-k-means oracle. Dropped from the battery to stay within the
# driver's 50-entry check budget; see COVERAGE.md.)


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.98) via the LSH scale
    path: banded-sketch bucket self-join → exact re-rank — never all-pairs.
    The oracle replicates the candidate generation with the hyperplanes
    inlined as literals; LSH==exact equality on this corpus is pinned in
    tests/test_pipeline_ops.py. The random test embeddings are
    near-orthogonal (max pairwise cos ≈ 0.44), so docs vec_id < 20 are
    re-emitted at vec_id+100000 with a small deterministic perturbation
    (first component +0.05) — genuine near-dups, constructed identically in
    the oracle."""
    emb = _read(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    base = emb.select(
        "vec_id", similarity.as_double(F.col("embedding")).alias("embedding")
    )
    arr = F.col("embedding")
    perturbed = base.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.element_at(arr, 1) + 0.05), F.slice(arr, 2, 1_000_000)
        ).alias("embedding"),
    )
    return similarity.near_dup_pairs_lsh(
        base.unionByName(perturbed), dim=_EMB_DIM, threshold=0.98
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def q_lang_id(spark, sf_dir):
    return textquality.lang_id(_read(spark, sf_dir, "documents"))


def q_quality_score(spark, sf_dir):
    return textquality.quality_score(_read(spark, sf_dir, "documents"))


def q_token_counts(spark, sf_dir):
    return textquality.token_counts(_read(spark, sf_dir, "documents"))


def q_fingerprint(spark, sf_dir):
    return textquality.fingerprint(_read(spark, sf_dir, "documents"))


def q_repetition_filter(spark, sf_dir):
    """Gopher-style repetition filters (top-unigram / top-bigram-chars /
    duplicated-trigram-chars fractions + composite keep decision)."""
    return textquality.repetition_stats(_read(spark, sf_dir, "documents"))


def q_pii_scrub(spark, sf_dir):
    """PII scrubbing (emails / phones / IPv4 → typed placeholders, with
    per-doc counts). The synthetic corpus is PII-free, so a deterministic
    augmentation plants contact strings on every 5th/7th doc — constructed
    identically in the oracle, so counts and scrubbed digests compare
    exactly (the patterns are RE2-safe and shared verbatim)."""
    from .operators import preprocess

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-0199"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(F.lit("")),
    )
    return preprocess.pii_scrub(docs.withColumn("text", aug))


def q_split_assign(spark, sf_dir):
    """Deterministic md5-bucket train/val/test assignment (75/12.5/12.5) —
    stable across runs, engines, and partitioning."""
    from .operators import preprocess

    return preprocess.split_assign(_read(spark, sf_dir, "documents"))


def q_sequence_packing(spark, sf_dir):
    """Sequence packing: concat-and-cut documents into 512-token context
    windows within 8 shards (per-shard running offsets — the global-order
    window this would otherwise need is exactly what does not scale).
    n_shards pinned: the oracle replays the same 8-shard layout."""
    from .operators import preprocess

    return preprocess.sequence_packing(
        _read(spark, sf_dir, "documents"), n_shards=8
    )


def q_multimodal_meta(spark, sf_dir):
    """Binary payload plumbing: wrap text bytes as an opaque media column,
    surface typed metadata (byte length + digest)."""
    from .operators.multimodal import wrap_binary

    docs = _read(spark, sf_dir, "documents")
    return wrap_binary(docs, "doc_id", "text", "text/plain").select(
        "media_id", "media_type", "n_bytes", "digest"
    )


_HTML_PREFIX = (
    '<html><head><title>Doc </title>'
    '<script type="text/javascript">var x = 1; console.log("never index");'
    "</script><style>.c { color: red }</style></head><body>"
    "<!-- hidden comment --><h1 class=\"t\">Heading</h1><p>"
)
_HTML_SUFFIX = (
    "</p><ul><li>alpha &amp; beta</li>"
    "<li>&quot;quoted&quot; &lt;escaped&gt; caf&#39;e&nbsp;end</li></ul>"
    "</body></html>"
)


def q_html_extract(spark, sf_dir):
    """S-row generalization (extract_words.py:26,142-143 → whole pages):
    wrap each document's text into a deterministic HTML page (script, style,
    comment, entities, nested tags), then extract the visible text with the
    JVM regexp chain (functions/html.py) — the identical RE2-safe chain runs
    in the DuckDB oracle. The Arrow-UDF path (textparse.html_to_text) is
    parity-tested against this chain in tests/test_textparse.py."""
    from .functions.html import html_visible_text_normalized

    docs = _read(spark, sf_dir, "documents")
    page = F.concat(F.lit(_HTML_PREFIX), F.col("text"), F.lit(_HTML_SUFFIX))
    vis = html_visible_text_normalized(page)
    toks = F.filter(F.split(F.lower(vis), "[^a-z]+"), lambda t: t != "")
    return docs.select(
        "doc_id",
        F.md5(vis).alias("digest"),
        F.size(toks).alias("n_tokens"),
    )


def q_sessionize(spark, sf_dir):
    """Sessionization: lag-gap > 30 min starts a new session; session ids
    are per-user cumulative sums (streaming session_window's batch twin)."""
    from pyspark.sql import Window

    e = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ; session TZ is pinned UTC so NTZ→LTZ→epoch
    # is exact and matches the oracle's epoch_ms//1000
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_gap = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    sess = with_gap.withColumn(
        "session_id",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    )
    # round value per event BEFORE summing (both engines): the true sum is
    # then a multiple of 0.01, so the outer 2dp round never lands on a .005
    # boundary where JVM/DuckDB summation order could disagree
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.round("value", 2)), 2).alias("sum_value"),
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "shingles": q_shingles,
    "minhash_signatures": q_minhash_signatures,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "jaccard_dedup": q_jaccard_dedup,
    "simhash": q_simhash,
    "dedup_clusters": q_dedup_clusters,
    "repetition_filter": q_repetition_filter,
    "pii_scrub": q_pii_scrub,
    "split_assign": q_split_assign,
    "sequence_packing": q_sequence_packing,
    "html_extract": q_html_extract,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embedding_near_dups": q_embedding_near_dups,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "token_counts": q_token_counts,
    "fingerprint": q_fingerprint,
    "multimodal_meta": q_multimodal_meta,
    "sessionize": q_sessionize,
}

_MARKERS_EN = "'the','and','of','to','is','you','that','it'"

# script-vote character classes shared verbatim with the Spark operator
from .operators.textquality import _HAN as _sq_han  # noqa: E402
from .operators.textquality import _HANGUL as _sq_hangul  # noqa: E402
from .operators.textquality import _KANA as _sq_kana  # noqa: E402
from .operators.textquality import _THAI as _sq_thai  # noqa: E402


def _markers_cte() -> str:
    """Marker lists as a DuckDB CTE body, generated from the SAME dict the
    Spark operator uses (operators/textquality.LANG_MARKERS) so the two can
    never drift."""
    from .operators.textquality import LANG_MARKERS

    parts = [
        f"SELECT '{lang}' AS lang, "
        f"unnest([{', '.join(_sql_quote(m) for m in markers)}]) AS term"
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    return "\n          UNION ALL ".join(parts)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"

ORACLE_SQL = {
    "dedup_exact": f"""
        WITH dd AS ({_DUPS_SQL})
        SELECT md5({_NORM_SQL}) AS digest,
               min(doc_id) AS keep_id, count(*) AS n_dups
        FROM dd GROUP BY 1
    """,
    "shingles": _SHINGLES_SQL,
    "minhash_signatures": f"""
        WITH sh AS ({_SHINGLES_SQL})
        SELECT doc_id, h, min(md5(h || '|' || shingle)) AS minhash
        FROM sh CROSS JOIN (SELECT unnest(range(12)) AS h)
        GROUP BY doc_id, h
    """,
    "minhash_lsh_pairs": f"""
        WITH sh AS ({_SHINGLES_SQL}),
        sig AS (
          SELECT doc_id, h, min(md5(h || '|' || shingle)) AS minhash
          FROM sh CROSS JOIN (SELECT unnest(range(12)) AS h)
          GROUP BY doc_id, h
        ),
        banded AS (
          SELECT doc_id, (h // 2) AS band,
                 md5(string_agg(h || ':' || minhash, ','
                     ORDER BY h || ':' || minhash)) AS bucket
          FROM sig GROUP BY doc_id, (h // 2)
        )
        SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    """,
    "jaccard_dedup": f"""
        WITH sh AS ({_SHINGLES_SQL}),
        sig AS (
          SELECT doc_id, h, min(md5(h || '|' || shingle)) AS minhash
          FROM sh CROSS JOIN (SELECT unnest(range(12)) AS h)
          GROUP BY doc_id, h
        ),
        banded AS (
          SELECT doc_id, (h // 2) AS band,
                 md5(string_agg(h || ':' || minhash, ','
                     ORDER BY h || ':' || minhash)) AS bucket
          FROM sig GROUP BY doc_id, (h // 2)
        ),
        cand AS (
          SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
          FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
          GROUP BY 1, 2
        )
        SELECT a, b, inter,
               sa.sz + sb.sz - inter AS union_size,
               round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN cand USING (a, b)
        JOIN sizes sa ON sa.doc_id = a
        JOIN sizes sb ON sb.doc_id = b
        WHERE round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) >= 0.5
    """,
    "simhash": f"""
        WITH dd AS ({_DUPS_SQL}),
        tf AS (
          SELECT doc_id, term, count(*) AS tf, md5(term) AS hash
          FROM (
            SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
            FROM dd
          ) WHERE term <> ''
          GROUP BY doc_id, term
        ),
        votes AS (
          SELECT doc_id, j,
                 sum(CASE WHEN substr(hash, j + 1, 1) IN
                     ('8','9','a','b','c','d','e','f')
                     THEN tf ELSE -tf END) AS v
          FROM tf CROSS JOIN (SELECT unnest(range(32)) AS j)
          GROUP BY doc_id, j
        )
        SELECT doc_id,
               string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY j)
                 AS simhash
        FROM votes GROUP BY doc_id
    """,
    # "html_extract" is assigned below the dict — built programmatically from
    # the functions/html.py pattern constants so Spark and DuckDB share them.
    "ann_cosine_topk": """
        WITH q AS (
          SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 5
        ),
        scored AS (
          SELECT q.q_id, e.vec_id,
                 round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
                   AS cos
          FROM embeddings e CROSS JOIN q WHERE e.vec_id >= 5
        ),
        ranked AS (
          SELECT q_id, vec_id, cos, row_number() OVER (
            PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
          FROM scored
        )
        SELECT q_id, vec_id, cos, rank FROM ranked WHERE rank <= 10
    """,
    "ann_lsh_topk": f"""
        WITH planes AS {_planes_values_sql(_EMB_DIM, 12)},
        v AS (SELECT vec_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id >= 5),
        q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 5),
        vsk AS (
          SELECT vec_id, string_agg(CASE WHEN list_inner_product(v, plane) >= 0
                 THEN '1' ELSE '0' END, '' ORDER BY p) AS sketch
          FROM v CROSS JOIN planes GROUP BY vec_id
        ),
        qsk AS (
          SELECT q_id, string_agg(CASE WHEN list_inner_product(qv, plane) >= 0
                 THEN '1' ELSE '0' END, '' ORDER BY p) AS sketch
          FROM q CROSS JOIN planes GROUP BY q_id
        ),
        vband AS (
          SELECT vec_id, b, substr(sketch, b * 4 + 1, 4) AS bucket
          FROM vsk CROSS JOIN (SELECT unnest(range(3)) AS b)
        ),
        qband AS (
          SELECT q_id, b, substr(sketch, b * 4 + 1, 4) AS bucket
          FROM qsk CROSS JOIN (SELECT unnest(range(3)) AS b)
        ),
        cand AS (SELECT DISTINCT q_id, vec_id FROM vband JOIN qband USING (b, bucket)),
        scored AS (
          SELECT c.q_id, c.vec_id,
                 round(list_cosine_similarity(v.v, q.qv), 6) AS cos
          FROM cand c JOIN v USING (vec_id) JOIN q USING (q_id)
        ),
        ranked AS (
          SELECT q_id, vec_id, cos, row_number() OVER (
            PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
          FROM scored
        )
        SELECT q_id, vec_id, cos, rank FROM ranked WHERE rank <= 10
    """,
    "embedding_near_dups": f"""
        WITH planes AS {_planes_values_sql(_EMB_DIM, 16)},
        base AS (
          SELECT vec_id, embedding::DOUBLE[] AS embedding
          FROM embeddings WHERE vec_id < 200
        ),
        ee AS (
          SELECT vec_id, embedding FROM base
          UNION ALL
          SELECT vec_id + 100000 AS vec_id,
                 list_prepend(embedding[1] + 0.05,
                              embedding[2:len(embedding)]) AS embedding
          FROM base WHERE vec_id < 20
        ),
        sk AS (
          SELECT vec_id, string_agg(CASE WHEN list_inner_product(embedding, plane) >= 0
                 THEN '1' ELSE '0' END, '' ORDER BY p) AS sketch
          FROM ee CROSS JOIN planes GROUP BY vec_id
        ),
        band AS (
          SELECT vec_id, b, substr(sketch, b * 4 + 1, 4) AS bucket
          FROM sk CROSS JOIN (SELECT unnest(range(4)) AS b)
        ),
        cand AS (
          SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
          FROM band l JOIN band r USING (b, bucket)
          WHERE l.vec_id < r.vec_id
        )
        SELECT c.a, c.b,
               round(list_cosine_similarity(ea.embedding, eb.embedding), 6) AS cos
        FROM cand c
        JOIN ee ea ON ea.vec_id = c.a
        JOIN ee eb ON eb.vec_id = c.b
        WHERE round(list_cosine_similarity(ea.embedding, eb.embedding), 6) >= 0.98
    """,
    "lang_id": f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split(trim(regexp_replace(lower(text),
                        '[^a-z]+', ' ', 'g')), ' ')) AS term
          FROM documents
        ),
        markers AS (
          {_markers_cte()}
        ),
        mvotes AS (
          SELECT t.doc_id, m.lang, count(*) AS votes
          FROM toks t JOIN markers m ON t.term = m.term
          GROUP BY 1, 2
        ),
        -- script-character votes for the no-whitespace scripts (ja/zh/ko/
        -- th): the same \\x{{...}} character classes the Spark operator
        -- uses (textquality._KANA etc.), valid in both Java regex and RE2
        script_counts AS (
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, '{_sq_kana}')) AS BIGINT) AS kana,
            CAST(len(regexp_extract_all(text, '{_sq_han}')) AS BIGINT) AS han,
            CAST(len(regexp_extract_all(text, '{_sq_hangul}')) AS BIGINT) AS hangul,
            CAST(len(regexp_extract_all(text, '{_sq_thai}')) AS BIGINT) AS thai
          FROM documents
        ),
        votes AS (
          SELECT * FROM mvotes
          UNION ALL
          SELECT doc_id, 'ja' AS lang, kana + han AS votes
          FROM script_counts WHERE kana > 0
          UNION ALL
          SELECT doc_id, 'zh', han FROM script_counts
          WHERE kana = 0 AND han > 0
          UNION ALL
          SELECT doc_id, 'ko', hangul FROM script_counts WHERE hangul > 0
          UNION ALL
          SELECT doc_id, 'th', thai FROM script_counts WHERE thai > 0
        ),
        best AS (
          SELECT doc_id, lang, votes, row_number() OVER (
            PARTITION BY doc_id ORDER BY votes DESC, lang ASC) AS rn
          FROM votes
        )
        SELECT d.doc_id,
               coalesce(b.lang, 'und') AS pred_lang,
               coalesce(b.votes, 0) AS votes
        FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
    """,
    "quality_score": f"""
        WITH base AS (
          SELECT doc_id, text,
                 length(text) AS n_chars,
                 length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                             w -> w <> '') AS toks
          FROM documents
        ),
        feat AS (
          SELECT doc_id, n_chars,
                 len(toks) AS n_tokens,
                 round(n_alpha / CAST(greatest(len(toks), 1) AS DOUBLE), 6)
                   AS mean_token_len,
                 round(n_alpha / CAST(greatest(n_chars, 1) AS DOUBLE), 6)
                   AS alpha_ratio,
                 round(len(list_filter(toks, w -> w IN ({_MARKERS_EN})))
                       / CAST(greatest(len(toks), 1) AS DOUBLE), 6)
                   AS stopword_ratio
          FROM base
        )
        SELECT doc_id, n_chars, n_tokens, mean_token_len, alpha_ratio,
               stopword_ratio,
               least(n_tokens / 100.0, 1.0) * 0.4
                 + alpha_ratio * 0.3 + stopword_ratio * 0.3 AS quality
        FROM feat
    """,
    "token_counts": """
        WITH base AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'),
                             w -> w <> '') AS ws_toks,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                             w -> w <> '') AS words,
                 list_filter(regexp_split_to_array(text, '[\\sa-zA-Z]+'),
                             w -> w <> '') AS other
          FROM documents
        )
        SELECT doc_id,
               len(ws_toks) AS ws_tokens,
               len(words) AS word_tokens,
               CAST(coalesce(list_sum(list_transform(words,
                    w -> CAST(ceil(length(w) / 4.0) AS INT))), 0)
                    + len(other) AS BIGINT) AS bpe_ish_tokens
        FROM base
    """,
    "fingerprint": f"""
        WITH base AS (
          SELECT doc_id, {_NORM_SQL} AS norm FROM documents
        ),
        pos AS (
          SELECT doc_id, norm,
                 unnest(generate_series(1, greatest(length(norm) - 7, 1))) AS i
          FROM base
        )
        SELECT doc_id, md5(any_value(norm)) AS digest,
               min(md5(substr(norm, i, 8))) AS min_gram_hash
        FROM pos GROUP BY doc_id
    """,
    "multimodal_meta": """
        SELECT doc_id AS media_id, 'text/plain' AS media_type,
               octet_length(encode(text)) AS n_bytes, md5(text) AS digest
        FROM documents
    """,
    "sessionize": """
        WITH gaps AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR (epoch_ms(ts) // 1000) - (epoch_ms(lag(ts) OVER w) // 1000) > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT user_id, value,
                 -- CAST: DuckDB sum(int) OVER yields HUGEINT; session_id is
                 -- an output column and Spark's side is BIGINT — the driver
                 -- hash is type-sensitive.
                 CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                 AS session_id
          FROM gaps
        )
        SELECT user_id, session_id, count(*) AS n_events,
               round(sum(round(value, 2)), 2) AS sum_value
        FROM sess GROUP BY user_id, session_id
    """,
}


def _html_extract_sql() -> str:
    """DuckDB twin of q_html_extract built from the SAME pattern constants
    as functions/html.py (RE2-safe: inline (?is) flags, no backreferences,
    no engine-specific option letters beyond 'g')."""
    from .functions.html import (
        ANY_TAG_PAT,
        BLOCK_TAG_PAT,
        COMMENT_PAT,
        ENTITIES,
        SCRIPT_PAT,
        STYLE_PAT,
    )

    vis = f"concat({_sql_quote(_HTML_PREFIX)}, text, {_sql_quote(_HTML_SUFFIX)})"
    vis = f"regexp_replace({vis}, {_sql_quote('(?s)' + COMMENT_PAT)}, ' ', 'g')"
    vis = f"regexp_replace({vis}, {_sql_quote('(?is)' + SCRIPT_PAT)}, ' ', 'g')"
    vis = f"regexp_replace({vis}, {_sql_quote('(?is)' + STYLE_PAT)}, ' ', 'g')"
    vis = f"regexp_replace({vis}, {_sql_quote('(?i)' + BLOCK_TAG_PAT)}, chr(10), 'g')"
    vis = f"regexp_replace({vis}, {_sql_quote(ANY_TAG_PAT)}, ' ', 'g')"
    for ent, rep in ENTITIES:
        vis = f"replace({vis}, {_sql_quote(ent)}, {_sql_quote(rep)})"
    vis = f"trim(regexp_replace({vis}, '\\s+', ' ', 'g'))"
    return f"""
        WITH v AS (SELECT doc_id, {vis} AS vis FROM documents)
        SELECT doc_id, md5(vis) AS digest,
               len(list_filter(regexp_split_to_array(lower(vis), '[^a-z]+'),
                               w -> w <> '')) AS n_tokens
        FROM v
    """


ORACLE_SQL["dedup_clusters"] = f"""
    WITH RECURSIVE jp AS ({ORACLE_SQL["jaccard_dedup"]}),
    edges AS (
      SELECT a AS src, b AS dst FROM jp
      UNION
      SELECT b AS src, a AS dst FROM jp
    ),
    reach AS (
      SELECT DISTINCT src AS node, src AS r FROM edges
      UNION
      SELECT e.src AS node, r.r FROM edges e JOIN reach r ON r.node = e.dst
    )
    SELECT node AS doc_id, min(r) AS cluster FROM reach GROUP BY node
"""

ORACLE_SQL["repetition_filter"] = """
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                         w -> w <> '') AS words
      FROM documents
    ),
    stats AS (
      SELECT doc_id, len(words) AS n_words,
             coalesce(list_sum(list_transform(words, w -> length(w))), 0)
               AS n_chars
      FROM base
    ),
    uni AS (
      SELECT doc_id, max(c) AS uni_c FROM (
        SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(words) AS w FROM base) GROUP BY 1, 2
      ) GROUP BY doc_id
    ),
    bipos AS (
      SELECT doc_id, words,
             unnest(generate_series(1, greatest(len(words) - 1, 1))) AS i
      FROM base
    ),
    bi0 AS (
      SELECT doc_id, words[i] || ' ' || words[i+1] AS g
      FROM bipos WHERE i + 1 <= len(words)
    ),
    topbi AS (
      SELECT doc_id, c AS bi_c, g AS bi_g FROM (
        SELECT doc_id, g, c, row_number() OVER (
          PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
        FROM (SELECT doc_id, g, count(*) AS c FROM bi0 GROUP BY 1, 2)
      ) WHERE rn = 1
    ),
    tripos AS (
      SELECT doc_id, words,
             unnest(generate_series(1, greatest(len(words) - 2, 1))) AS i
      FROM base
    ),
    tri0 AS (
      SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS g
      FROM tripos WHERE i + 2 <= len(words)
    ),
    duptri AS (
      SELECT doc_id, sum(c * (length(g) - 2)) AS dup_chars
      FROM (SELECT doc_id, g, count(*) AS c FROM tri0 GROUP BY 1, 2)
      WHERE c > 1 GROUP BY doc_id
    ),
    feat AS (
      SELECT s.doc_id,
        CAST(s.n_words AS BIGINT) AS n_words,
        round(coalesce(u.uni_c, 0)
              / CAST(greatest(s.n_words, 1) AS DOUBLE), 6)
          AS top_unigram_frac,
        round(coalesce(tb.bi_c * (length(tb.bi_g) - 1), 0)
              / CAST(greatest(s.n_chars, 1) AS DOUBLE), 6)
          AS top_bigram_char_frac,
        round(coalesce(d.dup_chars, 0)
              / CAST(greatest(s.n_chars, 1) AS DOUBLE), 6)
          AS dup_trigram_char_frac
      FROM stats s
      LEFT JOIN uni u USING (doc_id)
      LEFT JOIN topbi tb USING (doc_id)
      LEFT JOIN duptri d USING (doc_id)
    )
    SELECT doc_id, n_words, top_unigram_frac, top_bigram_char_frac,
           dup_trigram_char_frac,
           (n_words >= 20 AND top_unigram_frac <= 0.12
            AND top_bigram_char_frac <= 0.12
            AND dup_trigram_char_frac <= 0.25) AS keep
    FROM feat
"""

def _pii_scrub_sql() -> str:
    """Twin of q_pii_scrub, built from the SAME pattern constants
    (operators/preprocess.py) so the two can never drift."""
    from .operators.preprocess import EMAIL_PAT, IP_PAT, PHONE_PAT

    e, p, i = _sql_quote(EMAIL_PAT), _sql_quote(PHONE_PAT), _sql_quote(IP_PAT)
    return f"""
        WITH aug AS (
          SELECT doc_id,
            text
            || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com or 555-0199' ELSE '' END
            || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                 ELSE '' END AS text
          FROM documents
        )
        SELECT doc_id,
          len(regexp_extract_all(text, {e})) AS n_emails,
          len(regexp_extract_all(text, {p})) AS n_phones,
          len(regexp_extract_all(text, {i})) AS n_ips,
          md5(regexp_replace(regexp_replace(regexp_replace(
                text, {e}, '<EMAIL>', 'g'),
                {i}, '<IP>', 'g'),
                {p}, '<PHONE>', 'g')) AS scrubbed_digest
        FROM aug
    """


ORACLE_SQL["pii_scrub"] = _pii_scrub_sql()

ORACLE_SQL["split_assign"] = """
    SELECT doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket_hex,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                  THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
"""

ORACLE_SQL["sequence_packing"] = """
    WITH base AS (
      SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                             w -> w <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    s AS (
      SELECT doc_id, shard, n_tokens,
        -- CAST: DuckDB sum() OVER of BIGINT yields HUGEINT; start_offset is
        -- an output column and the driver hash is type-sensitive
        CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
             - n_tokens AS BIGINT) AS start_offset
      FROM base
    )
    SELECT doc_id, shard, n_tokens, start_offset,
           CAST(start_offset // 512 AS BIGINT) AS bin
    FROM s
"""

ORACLE_SQL["html_extract"] = _html_extract_sql()


def _ivf_oracle_sql(
    n_centroids: int = 8,
    n_probes: int = 4,
    k: int = 10,
    n_iters: int = 3,
    dim: int = _EMB_DIM,
) -> str:
    """DuckDB twin of q_ann_ivf_topk INCLUDING the k-means training.

    ivf_train (operators/similarity.py) is deterministic and data-driven but
    SQL-expressible because it is seed-free with a FIXED iteration count:
    init = the n_centroids vectors with smallest ids, then n_iters rounds of
    (assign: argmax cosine, ties → lowest cell) + (update: per-cell
    elementwise mean, empty cells keep the previous centroid). Each round is
    one pair of CTEs; retrieval = assignment under the final centroids,
    per-query top-n_probes cells, exact cosine re-rank. Centroid means may
    differ from Spark's in final ulps (summation order); every comparison
    they feed is an argmax over random embeddings with ~1e-2 margins, and
    the output cos is computed from the raw vectors, so the result sets are
    identical."""
    sql = f"""
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS v
          FROM embeddings WHERE vec_id >= 5
        ),
        q AS (
          SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 5
        ),
        dims AS (SELECT unnest(range(1, {dim + 1})) AS i),
        c0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
          FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT {n_centroids})
        )"""
    for it in range(1, n_iters + 1):
        prev = f"c{it - 1}"
        sql += f""",
        a{it} AS (
          SELECT vec_id, v, cell FROM (
            SELECT t.vec_id, t.v, c.cell,
                   row_number() OVER (PARTITION BY t.vec_id
                     ORDER BY list_cosine_similarity(t.v, c.cv) DESC,
                              c.cell ASC) AS rn
            FROM v t CROSS JOIN {prev} c
          ) WHERE rn = 1
        ),
        m{it} AS (
          SELECT a.cell, d.i, avg(a.v[d.i]) AS mu
          FROM a{it} a CROSS JOIN dims d GROUP BY a.cell, d.i
        ),
        c{it} AS (
          SELECT c.cell, coalesce(m.cv, c.cv) AS cv
          FROM {prev} c LEFT JOIN (
            SELECT cell, list(mu ORDER BY i) AS cv FROM m{it} GROUP BY cell
          ) m USING (cell)
        )"""
    final = f"c{n_iters}"
    sql += f""",
        assign AS (
          SELECT vec_id, v, cell FROM (
            SELECT t.vec_id, t.v, c.cell,
                   row_number() OVER (PARTITION BY t.vec_id
                     ORDER BY list_cosine_similarity(t.v, c.cv) DESC,
                              c.cell ASC) AS rn
            FROM v t CROSS JOIN {final} c
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT q_id, cell FROM (
            SELECT q.q_id, c.cell,
                   row_number() OVER (PARTITION BY q.q_id
                     ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
                              c.cell ASC) AS rn
            FROM q CROSS JOIN {final} c
          ) WHERE rn <= {n_probes}
        ),
        scored AS (
          SELECT p.q_id, a.vec_id,
                 round(list_cosine_similarity(a.v, q.qv), 6) AS cos
          FROM assign a JOIN probes p USING (cell) JOIN q USING (q_id)
        ),
        ranked AS (
          SELECT q_id, vec_id, cos, row_number() OVER (
            PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
          FROM scored
        )
        SELECT q_id, vec_id, cos, rank FROM ranked WHERE rank <= {k}
    """
    return sql


ORACLE_SQL["ann_ivf_topk"] = _ivf_oracle_sql()
# Full-probe IVF visits every cell, so it equals brute-force kNN exactly —
# the brute-force SQL IS its oracle (no need to replicate k-means training).
