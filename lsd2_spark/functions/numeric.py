"""Engine-portable rounding for oracle-gated columns.

``ROUND(x, 6)`` on a double is engine-defined at decimal half-ties:
Spark rounds half-up, DuckDB half-up or half-even depending on build.
Whenever a gated column can land exactly on a ``…5e-7`` boundary (any
quotient by a power of two, any sum of already-6dp values, any
integer-ratio mean), the gate becomes a cross-engine coin flip — this
fired twice (q42 ``feat_mean`` round 5, q64 ``fill_frac`` round 6).

``round6`` replaces the engine's rounding primitive with
``FLOOR(x * 1e6 + 0.5) / 1e6``: every step is an exactly-specified
IEEE-754 double operation (one multiply, one add, floor, one divide),
so any two engines produce bit-identical results for the same input —
including on exact half-ties, which deterministically round up.
Semantics match Spark's previous half-up behavior for non-negative
values; for negatives the tie goes toward +inf instead of away from
zero (irrelevant to gates: both engines still agree bit-for-bit).

This does NOT absorb accumulation-order drift between engines (neither
did ``ROUND``); it only removes the rounding-mode discretion.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1_000_000.0


def round6(col: Column) -> Column:
    """Deterministic half-up rounding of a double column to 6 dp.

    Bit-identical to the SQL twin :func:`round6_sql` in any engine.
    ``F.floor`` on a double yields BIGINT in Spark; dividing by the
    double literal promotes back to double, same as DuckDB's
    double-in/double-out FLOOR.
    """
    return F.floor(col.cast("double") * F.lit(_SCALE) + F.lit(0.5)) / F.lit(_SCALE)


def round6_sql(expr: str) -> str:
    """ANSI-SQL twin of :func:`round6` for DuckDB oracles."""
    return f"FLOOR(({expr}) * 1000000.0 + 0.5) / 1000000.0"


def round6_np(x):
    """NumPy twin of :func:`round6` for Arrow kernels.

    ``np.round`` is half-even while Spark/DuckDB ROUND are half-up-ish;
    this formula is bit-identical to the Column and SQL twins.
    """
    import numpy as np

    return np.floor(x * _SCALE + 0.5) / _SCALE
