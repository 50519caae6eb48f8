"""Shared helpers for the analytics query layer."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dsum(col, alias: str, scale: int = 10):
    """Order-independent SUM over doubles: cast to decimal (exact, associative
    addition regardless of partition/reduction order), sum, cast back to
    double. Bit-identical across Spark and DuckDB — a plain double SUM is
    reduction-order-dependent and breaks value-hash comparison."""
    return (
        F.sum(F.col(col).cast(f"decimal(38,{scale})")).cast("double").alias(alias)
    )


def dsum_expr(expr, alias: str, scale: int = 10):
    """Like :func:`dsum` but over an arbitrary Column expression."""
    return F.sum(expr.cast(f"decimal(38,{scale})")).cast("double").alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 10) -> str:
    """DuckDB-side twin of :func:`dsum`/`dsum_expr`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE) AS {alias}"
