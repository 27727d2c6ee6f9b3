"""Cross-engine-exact aggregate expressions.

Double-precision ``SUM`` is order-dependent: Spark's partial aggregation
sums partitions in nondeterministic order, DuckDB sums sequentially, so raw
double sums differ in the last ulps and fail a bitwise value-hash compare.
Fix: cast to ``DECIMAL(18,4)`` per row (defines the semantic as
"4-decimal-rounded input"), sum exactly (decimal addition is associative),
and cast the final result to DOUBLE — bit-identical in any engine and any
partition order.

Each helper here has a twin SQL string used in oracle queries; keep them in
sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dsum(col: Column | str) -> Column:
    """Exact sum: SUM(CAST(x AS DECIMAL(18,4))) cast back to DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Exact mean: decimal sum divided by count, both deterministic doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({expr})"


# --- exact decimal products -------------------------------------------------
# Products of doubles rounded via CAST(double AS DECIMAL) diverge between
# engines near rounding boundaries (~0.2% of rows at any scale).  The data's
# money columns are exact 2-decimal values, so casting the *factors* to
# decimal first and multiplying in the decimal domain is exact — no
# per-engine rounding anywhere.  Widths are chosen so neither engine
# overflows 38 digits: (9,2)*(4,2) -> (14,4); *(4,2) -> (19,6).

def _one() -> Column:
    return F.lit(1).cast("decimal(3,2)")


def revenue(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """price * (1 - discount), exact decimal."""
    return F.col(price).cast("decimal(9,2)") * (_one() - F.col(disc).cast("decimal(3,2)"))


def charge(
    price: str = "l_extendedprice",
    disc: str = "l_discount",
    tax: str = "l_tax",
) -> Column:
    """price * (1 - discount) * (1 + tax), exact decimal."""
    return revenue(price, disc) * (_one() + F.col(tax).cast("decimal(3,2)"))


def decsum(col: Column) -> Column:
    """Sum an already-decimal expression, final result as DOUBLE."""
    return F.sum(col).cast("double")


SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(9,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)
SQL_CHARGE = SQL_REVENUE + " * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"


def sql_decsum(expr: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE)"
