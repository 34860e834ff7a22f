"""Battery-wide oracle OUTPUT-type scan.

The driver's value hasher is type-sensitive (canonicalizes through
arrow/pandas), so a DuckDB oracle whose output carries HUGEINT (any
integer ``sum()``) or DECIMAL fails the driver gate even when the values
are bit-identical to Spark's (judge r2 root cause: tfidf_topk doc_len,
sessionize session_id). This test runs every oracle against sf0.001 and
asserts each output column's DuckDB type is in the driver-safe set — so
an uncast integer sum can never again pass the local replica and fail
the driver.
"""

import os

import duckdb
import pytest

from conftest import SF001

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _oracles():
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_oracles()))
def test_oracle_output_types_driver_safe(name):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.check_oracle import duck_type_violations

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF001}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    rel = con.sql(_oracles()[name])
    bad = duck_type_violations(rel.types)
    assert not bad, (
        f"oracle '{name}' output types {bad} are outside the driver-safe "
        f"set — CAST them (driver hash is type-sensitive; see check_oracle.py)"
    )
