"""Deterministic ingestion-scenario fixtures (FIXTURES.md group B).

The merge calculus needs a target snapshot, a newer source snapshot and a CDC
batch. These are pure, RNG-free functions of the driver's ``orders`` table
(natural key ``o_orderkey``, updated-at ``o_orderdate`` — mirroring the
reference's Salesforce ``Id``/``SystemModstamp`` and DMS
``recid``/``modifieddatetime`` configs, reference ``salesforce.py:48-52``,
``dmsdatabase1.py:73-77``).

Every fixture has BOTH a Spark builder and a DuckDB SQL string computing the
exact same rows, kept adjacent in this module so the oracle can never drift from
the engine-side fixture. Key-modulo selectors:

- day1 target  : keys with ``k % 10 != 7``          (~90% of orders)
- day2 source  : keys with ``k % 20 != 11``, where
    * ``k % 10 == 7``  → rows absent from day1      (INSERTS)
    * ``k % 20 == 11`` → day1 rows absent from day2 (DELETES)
    * ``k % 10 == 3``  → price +100.00, date +1 day (UPDATES, strictly newer)
    * ``k % 10 == 4``  → price +1.00, date UNCHANGED (touched but NOT an update:
      pins the strict ``>`` semantics, reference ``iceberg.py:162``)
- CDC batch    :
    * ``k % 10 == 2``  → two 'U' rows per key (+1d/+10.00 and +2d/+20.00) —
      exercises latest-row-per-key dedup (reference ``iceberg.py:203-216``)
    * ``k % 10 == 6``  → one 'D' row
    * ``k % 10 == 7``  → one 'I' row

Arithmetic is addition-only on doubles (bit-identical across engines — no
rounding-mode hazards) and whole-day timestamp intervals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORDERS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

# ---------------------------------------------------------------------------
# day1 — the existing target
# ---------------------------------------------------------------------------

DAY1_SQL = "SELECT * FROM orders WHERE o_orderkey % 10 <> 7"


def orders_day1(orders: DataFrame) -> DataFrame:
    return orders.filter(F.col("o_orderkey") % 10 != 7)


# ---------------------------------------------------------------------------
# day2 — the new source snapshot
# ---------------------------------------------------------------------------

DAY2_SQL = """
SELECT
    o_orderkey,
    o_custkey,
    o_orderstatus,
    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 100.0
         WHEN o_orderkey % 10 = 4 THEN o_totalprice + 1.0
         ELSE o_totalprice END AS o_totalprice,
    CASE WHEN o_orderkey % 10 = 3 THEN o_orderdate + INTERVAL 1 DAY
         ELSE o_orderdate END AS o_orderdate,
    o_orderpriority
FROM orders
WHERE o_orderkey % 20 <> 11
"""


def orders_day2(orders: DataFrame) -> DataFrame:
    k = F.col("o_orderkey")
    return (
        orders.filter(k % 20 != 11)
        .withColumn(
            "o_totalprice",
            F.when(k % 10 == 3, F.col("o_totalprice") + F.lit(100.0))
            .when(k % 10 == 4, F.col("o_totalprice") + F.lit(1.0))
            .otherwise(F.col("o_totalprice")),
        )
        .withColumn(
            "o_orderdate",
            F.when(k % 10 == 3, F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).otherwise(
                F.col("o_orderdate")
            ),
        )
        .select(*ORDERS_COLS)
    )


# ---------------------------------------------------------------------------
# CDC batch — multi-row-per-key change stream with op column
# ---------------------------------------------------------------------------

CDC_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       o_totalprice + 10.0 AS o_totalprice,
       o_orderdate + INTERVAL 1 DAY AS o_orderdate,
       o_orderpriority, 'U' AS op
FROM orders WHERE o_orderkey % 10 = 2
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus,
       o_totalprice + 20.0 AS o_totalprice,
       o_orderdate + INTERVAL 2 DAY AS o_orderdate,
       o_orderpriority, 'U' AS op
FROM orders WHERE o_orderkey % 10 = 2
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority, 'D' AS op
FROM orders WHERE o_orderkey % 10 = 6
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority, 'I' AS op
FROM orders WHERE o_orderkey % 10 = 7
"""


def orders_cdc(orders: DataFrame) -> DataFrame:
    k = F.col("o_orderkey")
    u1 = (
        orders.filter(k % 10 == 2)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(10.0))
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
        .withColumn("op", F.lit("U"))
    )
    u2 = (
        orders.filter(k % 10 == 2)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(20.0))
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 2 DAY"))
        .withColumn("op", F.lit("U"))
    )
    d = orders.filter(k % 10 == 6).withColumn("op", F.lit("D"))
    i = orders.filter(k % 10 == 7).withColumn("op", F.lit("I"))
    return (
        u1.unionByName(u2)
        .unionByName(d)
        .unionByName(i)
        .select(*ORDERS_COLS, "op")
    )


def with_ctes(body: str) -> str:
    """Wrap an oracle query body with the fixture CTEs."""
    return (
        f"WITH day1 AS ({DAY1_SQL}),\n"
        f"day2 AS ({DAY2_SQL}),\n"
        f"cdc AS ({CDC_SQL})\n"
        f"{body}"
    )
