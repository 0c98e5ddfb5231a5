"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round4(col: Column) -> Column:
    """Engine-portable half-up rounding to 4 decimals:
    floor(x*10000 + 0.5)/10000. Spark's F.round is HALF_UP while DuckDB's
    round() is half-to-even — identical double arithmetic on both engines
    makes this formula deterministic across them (used by every operator
    whose output is oracle-compared)."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


ROUND4_SQL = "floor({x} * 10000 + 0.5) / 10000"
