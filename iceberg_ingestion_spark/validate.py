"""Source↔target equivalence validation.

Reference ``src/data_ingestion/common/iceberg.py:291-301`` (``diff_count``):
after a full/replace ingest, the target must be bag-equal to the source modulo
the audit column and soft-deleted rows; asserted by the ``--test`` Airflow task
(reference ``salesforce.py:80-83``, ``dmsdatabase1.py:115-118``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_ingestion_spark.model import HARD_DELETED_COL, INGESTION_DATETIME_COL


def bag_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Symmetric bag difference (reference ``iceberg.py:301``:
    ``a.exceptAll(b).union(b.exceptAll(a))``)."""
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def diff_count(
    source: DataFrame,
    target: DataFrame,
    audit_cols: tuple[str, ...] = (INGESTION_DATETIME_COL,),
    soft_delete_col: str = HARD_DELETED_COL,
) -> int:
    """Rows in the symmetric difference after stripping audit columns and
    excluding soft-deleted target rows (reference ``iceberg.py:291-301``).

    Column sets (net of audit/soft-delete columns) must match exactly: a
    target with unexpected extra columns, or missing a source column, is a
    schema drift the row diff cannot express — raised as ``ValueError`` so
    ``--test`` fails loudly instead of silently projecting columns away."""
    src = source.drop(*audit_cols)
    tgt = target
    if soft_delete_col in tgt.columns:
        tgt = tgt.filter(F.col(soft_delete_col) == F.lit(False)).drop(soft_delete_col)
    tgt = tgt.drop(*audit_cols)
    src_only = set(src.columns) - set(tgt.columns)
    tgt_only = set(tgt.columns) - set(src.columns)
    if src_only or tgt_only:
        raise ValueError(
            "diff_count: column sets differ — "
            f"source-only={sorted(src_only)}, target-only={sorted(tgt_only)}"
        )
    return bag_diff(src.select(*sorted(src.columns)), tgt.select(*sorted(src.columns))).count()


def expectation_report(df: DataFrame, rules: dict[str, "F.Column"]) -> DataFrame:
    """Data-quality expectations in ONE pass: each rule is a boolean Column
    (TRUE = row passes); the report is one row per rule with checked /
    violation counts and a pass flag. All rules evaluate in a single scan +
    single 1-row-per-rule aggregate (conditional sums), not one job per rule
    — at 100 TB a 20-rule suite costs one table read. NULL rule results
    count as violations (an expectation that cannot be evaluated is not
    met). Uniqueness/cross-row rules need a window or aggregate column —
    build them with the usual primitives and feed the boolean here.
    """
    aggs = []
    for name, cond in rules.items():
        ok = F.sum(F.coalesce(cond.cast("int"), F.lit(0)))
        aggs.append(
            F.struct(
                F.lit(name).alias("rule"),
                F.count(F.lit(1)).alias("n_checked"),
                (F.count(F.lit(1)) - ok).alias("n_violations"),
                ((F.count(F.lit(1)) - ok) == 0).alias("passed"),
            )
        )
    # single array column, no per-rule column names — rule names stay data
    # (arbitrary strings), never identifiers
    one = df.agg(F.array(*aggs).alias("_rules"))
    stacked = one.select(F.explode("_rules").alias("r"))
    return stacked.select("r.rule", "r.n_checked", "r.n_violations", "r.passed")


def referential_violations(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Foreign-key expectation across tables: child rows whose ``fk`` has no
    match in ``parent.pk`` (NULL fks are violations too — an unknowable
    reference is not an intact one; filter first if NULLs are legal).
    One left-anti join keyed on the fk — AQE broadcasts the parent key set
    when small; feed ``.count()`` to a gate, or the rows to a quarantine
    sink. Composes with :func:`expectation_report` via
    ``F.col(fk).isNotNull() & <precomputed membership flag>`` when a single
    one-scan report is preferred."""
    keys = parent.select(F.col(pk).alias(fk)).distinct()
    return child.join(keys, on=fk, how="left_anti")


def profile_drift(a: DataFrame, b: DataFrame, columns: list[str]) -> DataFrame:
    """Column-profile drift between two snapshots of one relation (day-over-
    day ingest monitoring): one row per profiled column with row count, NULL
    count, exact distinct count and (numeric columns only) a decimal-exact
    value sum for each side, plus the row-count delta. A pipeline gates a
    publish on these deltas — sudden NULL-rate spikes or NDV collapses are
    the classic silent upstream-extract failures the reference's ``--test``
    equivalence check can't see (it compares a table to ITSELF one commit
    later, not to yesterday's profile).

    Each side is ONE scan producing a 1-row aggregate (conditional sums;
    Spark plans the multi-column COUNT(DISTINCT) via a single expand —
    k-profiled columns cost one k× expanded pass, not k jobs; swap in
    approx_count_distinct at 100 TB if the expand dominates). The per-column
    reshape happens on the two 1-row results via array+explode — column
    names stay DATA, never identifiers — and the final join is on the
    column-name key of two k-row relations (trivially broadcast).

    Sums are DECIMAL(30,2)-exact then cast to double, so results are
    bit-identical across engines and partitionings (the established q1
    convention); non-numeric columns profile with NULL sums.
    """
    if not columns:
        raise ValueError("profile_drift: columns must be non-empty")
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}

    def side(df: DataFrame, suffix: str) -> DataFrame:
        dts = dict(df.dtypes)
        structs = []
        for c in columns:
            # numeric-ness is decided PER SIDE: if b drifted to a decimal
            # precision/scale a never had (exactly the schema drift this
            # monitors), b's sum must still populate — a set derived from
            # a.dtypes alone would silently NULL it and fake a value drift
            is_num = dts[c] in numeric or dts[c].startswith("decimal")
            s = (
                F.sum(F.col(c).cast("decimal(30,2)")).cast("double")
                if is_num
                else F.lit(None).cast("double")
            )
            structs.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.count(F.lit(1)).alias(f"n_{suffix}"),
                    F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{suffix}"),
                    F.count_distinct(F.col(c)).alias(f"ndv_{suffix}"),
                    s.alias(f"sum_{suffix}"),
                )
            )
        return df.agg(F.array(*structs).alias("_p")).select(
            F.explode("_p").alias("p")
        ).select("p.*")

    out = side(a, "a").join(side(b, "b"), "column")
    return out.withColumn("delta_rows", F.col("n_b") - F.col("n_a"))
