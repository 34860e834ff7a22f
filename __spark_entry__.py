"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship per-document TF-IDF top-k over the
sf0.001 documents table; ``queries()`` / ``oracle_sql()`` expose the operator
battery defined in ``words_in_context_spark.driver_queries`` (each entry cites
the SURVEY.md §2 inventory row it evidences).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from words_in_context_spark.driver_queries import q_tfidf_topk

    return q_tfidf_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from words_in_context_spark import driver_queries, driver_queries_pipeline

    return {**driver_queries.QUERIES, **driver_queries_pipeline.QUERIES}


def oracle_sql() -> dict[str, str]:
    from words_in_context_spark import driver_queries, driver_queries_pipeline

    return {**driver_queries.ORACLE_SQL, **driver_queries_pipeline.ORACLE_SQL}
