"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted,
floats canonicalized). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    import datetime as dt

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(rows)


# The driver's hasher canonicalizes through arrow/pandas and is TYPE
# sensitive: DuckDB HUGEINT (any integer sum()) or DECIMAL in an oracle's
# OUTPUT arrives as decimal128 and hashes differently from Spark's BIGINT
# even when values are bit-identical (judge r2 root cause: tfidf_topk,
# sessionize). fetchall() converts HUGEINT -> int and masked this for two
# rounds, so value comparison alone is NOT sufficient — gate the types too.
_ALLOWED_DUCK_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "TIMESTAMP", "DATE",
}


def duck_type_violations(types) -> list[str]:
    """Return the subset of DuckDB output types outside the driver-safe set
    (lists of safe element types are allowed for collect_set-style outputs)."""
    bad = []
    for t in types:
        s = str(t).upper()
        base = s[:-2] if s.endswith("[]") else s
        if base not in _ALLOWED_DUCK_TYPES:
            bad.append(s)
    return bad


def _type_class(s: str) -> str:
    """Collapse a type name (Spark or DuckDB) to a comparison class so the
    two engines' outputs can be checked for driver-hash compatibility."""
    s = s.upper()
    if s.endswith("[]"):
        return "list<" + _type_class(s[:-2]) + ">"
    if s.startswith("ARRAY<") and s.endswith(">"):
        return "list<" + _type_class(s[6:-1]) + ">"
    if s in ("BIGINT", "INTEGER", "INT", "SMALLINT", "TINYINT",
             "UBIGINT", "UINTEGER", "LONG", "SHORT", "BYTE"):
        return "int"
    if s in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if s in ("VARCHAR", "STRING", "TEXT"):
        return "str"
    if s == "BOOLEAN":
        return "bool"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s == "DATE":
        return "date"
    return s.lower()


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from words_in_context_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(cores=8, app_name="check_oracle", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0

        if name not in oracles:
            print(f"  {name:32s} rows={len(srows):7d} (rows-only, no oracle) "
                  f"[{t_spark:.1f}s]")
            if not srows:
                print(f"    !! EMPTY RESULT")
                failures += 1
            continue

        t0 = time.time()
        rel = con.sql(oracles[name])
        dcols = list(rel.columns)
        dtypes = [str(t) for t in rel.types]
        drows = rel.fetchall()
        t_duck = time.time() - t0

        sh, sn = table_hash(scols, srows)
        dh, dn = table_hash(dcols, drows)
        type_errs = duck_type_violations(dtypes)
        styp = {f.name: _type_class(f.dataType.simpleString())
                for f in sdf.schema.fields}
        dtyp = dict(zip(dcols, (_type_class(t) for t in dtypes)))
        for c in set(scols) & set(dcols):
            if styp[c] != dtyp[c]:
                type_errs.append(f"{c}: spark={styp[c]} duck={dtyp[c]}")
        ok = (sorted(scols) == sorted(dcols)) and sh == dh and not type_errs
        status = "OK " if ok else "FAIL"
        print(f"  {name:32s} {status} rows={sn}/{dn} hash={sh}/{dh} "
              f"[spark {t_spark:.1f}s duck {t_duck:.2f}s]")
        if not ok:
            failures += 1
            if type_errs:
                print(f"    oracle TYPE violations (driver hash is "
                      f"type-sensitive): {type_errs}")
            if sorted(scols) != sorted(dcols):
                print(f"    cols spark={sorted(scols)} duck={sorted(dcols)}")
            else:
                sset = {tuple(canon(v) for v in r) for r in srows}
                dset = {tuple(canon(v) for v in r) for r in drows}
                so = sorted(scols)
                sidx = [scols.index(c) for c in so]
                didx = [dcols.index(c) for c in so]
                sset = {tuple(canon(r[i]) for i in sidx) for r in srows}
                dset = {tuple(canon(r[i]) for i in didx) for r in drows}
                print(f"    cols(sorted)={so}")
                for r in list(sset - dset)[:3]:
                    print(f"    spark-only: {r}")
                for r in list(dset - sset)[:3]:
                    print(f"    duck-only:  {r}")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {failures} failing queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
