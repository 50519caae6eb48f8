"""Shared helpers for the analytics query layer."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# JIT-able generated code
# -----------------------
# Spark only abandons a whole-stage-codegen method when its compiled size
# exceeds spark.sql.codegen.hugeMethodLimit (default 65535 B) — but HotSpot
# refuses to JIT any method over 8000 B of bytecode (-XX:-DontCompileHugeMethods
# is never set on real clusters), so a fused method between those two limits
# runs as INTERPRETED BYTECODE forever.  The 64-term _flat_dot expressions
# (similarity.py) cross that line once they are fused into a join stage:
# measured at sf0.1, the semdedup cell-join sim projection ran 4.5 s over
# 250k pairs with the default limit and 0.04 s with the limit at 8000
# (Spark then splits the stage into per-operator projections, each small
# enough to JIT) — a 100x cliff invisible to `.explain`, which shows the
# same WholeStageCodegen plan either way.  Results are bit-identical: only
# the execution strategy changes, never the expression tree.
_HUGE_METHOD_LIMIT = "8000"


def ensure_jitable_codegen(spark: SparkSession) -> None:
    """Cap codegen method size at HotSpot's JIT ceiling (idempotent)."""
    try:
        cur = spark.conf.get("spark.sql.codegen.hugeMethodLimit")
    except Exception:
        cur = None
    if cur != _HUGE_METHOD_LIMIT:
        spark.conf.set("spark.sql.codegen.hugeMethodLimit", _HUGE_METHOD_LIMIT)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table (TESTDATA.md)."""
    ensure_jitable_codegen(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Canonical tokenizer + per-word hash
# -----------------------------------
# ONE definition of the whitespace tokenizer and the md5-prefix word hash,
# shared by every gram/bigram/span/fingerprint operator (dedup.py, text.py).
# Three drifting copies of this recipe existed through round 3; if the
# tokenizer or hash ever changes, every operator must move together or
# cross-operator joins on word hashes silently stop matching.

WORDS = r"split(lower(trim(text)), '\\s+')"
SQL_WORDS = r"regexp_split_to_array(lower(trim(text)), '\s+')"


def word_hash32(offset: int = 1) -> str:
    """Spark expr: array<bigint> of per-word 32-bit hashes — md5 hex chars
    [offset, offset+8) as int64. *offset* selects an independent 32-bit
    stream from the same digest (offset=1 and offset=9 are independent),
    letting composite keys reach 64 bits of word-level entropy with one md5
    evaluation recipe."""
    return (
        f"transform({WORDS}, w -> "
        f"cast(conv(substring(md5(w), {offset}, 8), 16, 10) as bigint))"
    )


def sql_word_hash32(offset: int = 1) -> str:
    """DuckDB twin of :func:`word_hash32` (bit-identical values)."""
    return (
        f"[CAST(('0x' || substring(md5(w), {offset}, 8)) AS BIGINT) "
        f"FOR w IN {SQL_WORDS}]"
    )


# Order-independent SUM over doubles
# ----------------------------------
# A plain double SUM is reduction-order-dependent (float addition is not
# associative), so its low bits vary with partition layout and break the
# value-hash parity check against the DuckDB oracle.  Rounds 1-2 fixed this by
# summing through decimal(38,10) — exact and associative, but precision 38
# exceeds Spark's 18-digit long-backed Decimal, so every partial sum runs on
# Java BigDecimal: measured 3-4x slower than the whole rest of the TPC-H-Q1
# aggregation at sf1 (24 s -> 8 s on the same window when switched off).
# Decimal(18,6) does not help: Spark widens SUM buffers to decimal(28,6),
# which is BigDecimal-backed again.
#
# Round 3 replaces it with long fixed-point: round each value to an integer
# number of 10^-6 units, SUM the longs (whole-stage-codegen fast path,
# associative-exact), divide back at the end.  Bit-parity with DuckDB holds
# because ROUND on a positive-or-negative double is half-away-from-zero in
# both engines (Spark's HALF_UP via BigDecimal.valueOf agrees with DuckDB's
# std::round at integer granularity: every shortest-repr .5 below 2^52 is an
# exact binary .5), and a sum of identical longs converts to double
# identically.
#
# Overflow bound: |group sum| must stay below 2^63/10^scale — 9.2e12 at the
# default scale 6.  sf1 group sums here are ~1e10.  At a 100 TB corpus drop
# `scale` to 2 (cent precision, bound 9.2e16) or pre-aggregate per partition;
# the scale knob is threaded through all three helpers so Spark and the
# oracle move together.

_DSUM_SCALE = 6


def _fx(expr, scale: int):
    return F.round(expr * F.lit(float(10 ** scale)), 0).cast("long")


def dsum(col, alias: str, scale: int = _DSUM_SCALE):
    """Order-independent SUM of a double column via long fixed-point."""
    return dsum_expr(F.col(col), alias, scale)


def dsum_expr(expr, alias: str, scale: int = _DSUM_SCALE):
    """Like :func:`dsum` but over an arbitrary Column expression."""
    return (
        (F.sum(_fx(expr, scale)).cast("double") / F.lit(float(10 ** scale)))
        .alias(alias)
    )


def sql_dsum(expr: str, alias: str, scale: int = _DSUM_SCALE) -> str:
    """DuckDB-side twin of :func:`dsum`/`dsum_expr` (same fixed-point units)."""
    unit = float(10 ** scale)
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {unit!r}, 0) AS BIGINT)) AS DOUBLE)"
        f" / {unit!r} AS {alias}"
    )
