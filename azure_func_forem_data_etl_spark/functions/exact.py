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


# The final decimal->double cast round-trips through STRING on the
# DuckDB side: once the scale-4 integer exceeds 2^53, DuckDB's direct
# decimal->double (int128 to double, THEN scale by 10^-4) compounds two
# roundings and can land 1 ulp off Spark's correctly-rounded BigDecimal
# cast (first seen on time_weighted_avg_user in the r10 skew sweep; hit
# the whole dsum backbone in the r11 magnitude-spread sweep).  The
# string round-trip is correctly rounded on both engines and identical
# to the direct cast below 2^53.


def sql_dsum(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS STRING) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS STRING) AS DOUBLE)"
        f" / COUNT({expr})"
    )


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


def dround(col: Column, k: int = 4) -> Column:
    """Cross-engine round(double, k), total on every finite double.

    Plain round diverges at scaled-half boundaries: DuckDB rounds the
    scaled double (x * 10^k can land exactly on .5 while x itself sits
    just below the true half), Spark's Round rounds the double's exact
    binary expansion — e.g. the Flesch score -3973.06434999999965 rounds
    to -3973.0644 (DuckDB) vs -3973.0643 (Spark), found by the r11
    long-docs sweep.  The contract instead rounds HALF_UP on the
    double's SHORTEST DECIMAL REPR, which both engines print
    identically, in three regimes (r11 embedding-magnitude sweep):

    - ``|x| < 0.5 * 10^-k``: exactly 0.0.  DuckDB 1.0's scientific
      string->decimal parse rounds on the FIRST SIGNIFICANT digit
      regardless of exponent depth ('9e-30'::DECIMAL(38,6) = 1e-6), so
      sub-half-quantum values must short-circuit before the parse.
    - ``|x| >= 1e15``: identity.  Above 2^53-ish the quantum is far
      below ulp(x) so true rounding is a no-op anyway, and the parse
      becomes untrustworthy: DuckDB prints such doubles in scientific
      notation and its scientific decimal parse keeps only ~15 mantissa
      digits ('1.5000000000000002e+20' loses the trailing 2).
    - mid range: string -> DECIMAL(38,k) -> string -> double.  Both
      engines print the same shortest repr (plain notation throughout
      this range), parse string->decimal HALF_UP, print decimals with
      exact digits, and parse string->double correctly rounded — no
      step relies on either engine's direct decimal<->double cast
      (DuckDB's is 1 ulp off past 2^53, see sql_dsum)."""
    q = F.lit(0.5 * 10.0 ** (-k))
    mid = (
        col.cast("string")
        .cast(f"decimal(38,{k})")
        .cast("string")
        .cast("double")
    )
    return (
        F.when(F.abs(col) < q, F.lit(0.0))
        .when(F.abs(col) >= F.lit(1e15), col + F.lit(0.0))
        .otherwise(mid)
    )


def sql_dround(expr: str, k: int = 4) -> str:
    """Oracle twin of :func:`dround` (see its regime notes)."""
    x = f"({expr})"
    mid = f"CAST(CAST(CAST(CAST(CAST({x} AS STRING) AS DECIMAL(38,{k})) AS STRING) AS DOUBLE) AS DOUBLE)"
    return (
        f"(CASE WHEN ABS({x}) < {0.5 * 10.0 ** (-k)!r} THEN 0.0 "
        f"WHEN ABS({x}) >= 1e15 THEN {x} + 0.0 "
        f"ELSE {mid} END)"
    )


def sql_decsum(expr: str) -> str:
    # STRING round-trip for the same 2^53 reason as sql_dsum (charge
    # runs at scale 6, so its sum's integer form crosses 2^53 a thousand
    # times sooner than a scale-4 sum)
    return f"CAST(CAST(SUM({expr}) AS STRING) AS DOUBLE)"
