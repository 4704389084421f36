"""Cross-engine half-up rounding — ONE implementation pair.

Spark's round() is HALF_UP, DuckDB's round() is round-half-even on some
paths, python's round() is banker's: on an exact decimal half they
disagree (a round-1 driver mismatch). The convention (CLAUDE.md) is
floor(x * 10^n + 0.5) / 10^n computed on identical doubles on BOTH
sides. Every oracle-compared rounded column must go through one of
these two helpers (Column form for Spark, python form for VALUES-literal
oracles) — or spell the same formula in raw SQL.

Non-negative inputs only (all current call sites: scores, ratios,
feature magnitudes). For negatives, floor(x+0.5) rounds toward +inf on
halves, which is NOT half-away-from-zero — extend here, in one place,
if a signed site ever appears.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, n: int = 4) -> Column:
    p = float(10**n)
    return F.floor(col * p + F.lit(0.5)) / p


def round_half_up_py(v: float, n: int = 4) -> float:
    p = 10**n
    return math.floor(v * p + 0.5) / p
