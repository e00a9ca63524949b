"""Single-call literal-array construction.

PySpark's ``F.lit(list)`` decomposes into one ``lit()`` py4j round-trip
PER ELEMENT (plus a ``CreateArray`` with that many children to analyze):
measured 21 s of driver time for a 4096-element frozen-model table vs
10 ms for the same array parsed from one SQL literal expression. Catalyst
constant-folds the parsed ``array(...)`` to the identical single
``Literal`` the element-wise form produced, so plans and results are
unchanged — only plan-construction time drops.

Applies to the frozen-model tables that ride query plans as literal
columns (DSIR log-ratio tables, SoftDeDup bucketed gram counts, ADC
lookup tables): thousands of elements, rebuilt per plan because the
fitted values change with the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_long_array(values) -> Column:
    """``array<bigint>`` literal in one py4j call."""
    vals = [int(v) for v in values]
    if not vals:
        return F.expr("CAST(array() AS array<bigint>)")
    return F.expr("array(" + ",".join(f"{v}L" for v in vals) + ")")


def lit_double_array(values) -> Column:
    """``array<double>`` literal in one py4j call.

    ``repr(float)`` is the shortest round-tripping decimal form; both
    Python and the SQL parser's ``Double.parseDouble`` are correctly
    rounded, so each element reconstructs bit-exactly. Non-finite values
    fall back to the element-wise path (SQL has no inf/nan literal).
    """
    vals = [float(v) for v in values]
    if not vals:
        return F.expr("CAST(array() AS array<double>)")
    if not all(math.isfinite(v) for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")
