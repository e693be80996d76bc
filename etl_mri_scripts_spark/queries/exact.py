"""Cross-engine exact arithmetic helpers.

Float sums are order-dependent; Spark aggregates per-partition while the
DuckDB oracle sums sequentially, so ``sum(double)`` can drift in the last
bits and break hash comparison. The test data is fixed-point (prices and
rates have exactly 2 decimals, quantities are whole doubles), so we lift
money math onto 64-bit integers — exact and associative in BOTH engines —
and divide back down only at the very end. At 100 TB scale this is also the
*fast* path: long arithmetic stays inside whole-stage codegen and avoids
decimal overhead.

Spark expression <-> DuckDB SQL fragment pairs are kept adjacent so the
parity is auditable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column) -> Column:
    """2-decimal double -> exact integer hundredths."""
    return F.round(col * 100).cast("long")


def cents_sql(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def whole(col: Column) -> Column:
    """whole-number double (e.g. l_quantity) -> exact integer."""
    return F.round(col).cast("long")


def whole_sql(expr: str) -> str:
    return f"CAST(round({expr}) AS BIGINT)"


# revenue terms: extendedprice * (1 - discount)  in 1e-4 units
def revenue_fixed(ep: Column, disc: Column) -> Column:
    return cents(ep) * (100 - cents(disc))


REVENUE_FIXED_SQL = (
    f"{cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})"
)

# charge terms: extendedprice * (1 - discount) * (1 + tax)  in 1e-6 units
def charge_fixed(ep: Column, disc: Column, tax: Column) -> Column:
    return cents(ep) * (100 - cents(disc)) * (100 + cents(tax))


CHARGE_FIXED_SQL = (
    f"{cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})"
    f" * (100 + {cents_sql('l_tax')})"
)
