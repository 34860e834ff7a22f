"""Physical-plan inspection helpers: get the formatted plan as a string and
assert scale-critical properties (pushdown, pruning, broadcast, codegen)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    jdf = df._jdf
    sess = df.sparkSession
    try:
        return sess._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            jdf.queryExecution(), mode
        )
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of the formatted plan (parquet scan pushdown)."""
    return "\n".join(
        line.strip()
        for line in plan_string(df).splitlines()
        if "PushedFilters" in line or "PartitionFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    """ReadSchema lines — verifies column pruning reached the scan."""
    return "\n".join(
        line.strip()
        for line in plan_string(df).splitlines()
        if "ReadSchema" in line
    )
