"""Apply a change-set to a target table.

The reference applies changes with Iceberg ``MERGE INTO`` (reference
``src/data_ingestion/common/iceberg.py:233-244``):

    MERGE INTO target USING changes ON <keys>
    WHEN MATCHED AND source.op = 'D' THEN DELETE            -- or UPDATE SET * when keep_deletes
    WHEN MATCHED AND source.op = 'U' THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *

Two implementations of the same logical semantics:

- :func:`merge_dataframes` — pure DataFrame program for any sink (no Iceberg
  runtime needed): the unmatched target rows survive via a left-anti join on the
  keys, matched rows are replaced by the change payload. Because the change-set
  produced by the calculus carries the full payload for every op, ``UPDATE SET *``
  and ``INSERT *`` collapse to "take the change row".
- :func:`merge_into_sql` — the SQL string for the Iceberg path, used by
  ``IcebergSink`` when the runtime jar is present.

Scale notes: the anti join shuffles both sides on the natural keys, exactly like
the MERGE's join; when the change-set is small relative to the target (the daily
case), AQE converts the anti join to a broadcast and the target is rewritten in
one pass with no wide shuffle of the target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_ingestion_spark.changes import with_soft_delete_flag
from iceberg_ingestion_spark.model import (
    HARD_DELETED_COL,
    INGESTION_DATETIME_COL,
    OP_DELETE,
    ChangeSpec,
)


def merge_dataframes(
    target: DataFrame,
    changes: DataFrame,
    spec: ChangeSpec,
    keep_deletes: bool = False,
) -> DataFrame:
    """Resolve a change-set against the target; returns the post-merge table.

    Matches Iceberg MERGE semantics for change-sets with at most one row per key
    (guaranteed upstream by the calculus / CDC window dedup, reference
    ``iceberg.py:203-216``; Iceberg itself raises on ambiguous matches).

    - ``keep_deletes=False``: op='D' rows vanish (``WHEN MATCHED AND op='D' THEN
      DELETE``, reference ``iceberg.py:241``).
    - ``keep_deletes=True``: op='D' rows are kept with ``hard_deleted=true``
      (``UPDATE SET *`` after the soft-delete rewrite, reference
      ``iceberg.py:224-227,241``).
    """
    if keep_deletes:
        changes = with_soft_delete_flag(changes, spec.op_col)
        if HARD_DELETED_COL not in target.columns:
            target = target.withColumn(HARD_DELETED_COL, F.lit(False).cast("boolean"))
        applied = changes
    else:
        applied = changes.filter(F.col(spec.op_col) != F.lit(OP_DELETE))

    applied = applied.drop(spec.op_col)
    # Align schemas both ways: the change-set may add audit columns the target
    # lacks yet (first soft-delete run), and a target may carry columns a
    # partial change-set lacks.
    for c in applied.columns:
        if c not in target.columns:
            target = target.withColumn(c, F.lit(None).cast(applied.schema[c].dataType))
    for c in target.columns:
        if c not in applied.columns:
            applied = applied.withColumn(c, F.lit(None).cast(target.schema[c].dataType))
    applied = applied.select(*target.columns)

    untouched = target.alias("target").join(
        changes.select(*spec.natural_keys).alias("source"),
        on=[F.col(f"target.{k}") == F.col(f"source.{k}") for k in spec.natural_keys],
        how="left_anti",
    )
    return untouched.unionByName(applied)


def merge_snapshot_fused(
    target: DataFrame,
    source: DataFrame,
    spec: ChangeSpec,
    options: "MergeOptions" = None,
    ingestion_ts=None,
    include_deletes: bool = True,
    keep_deletes: bool = False,
    soft_delete_col: str | None = None,
) -> DataFrame:
    """Snapshot merge in ONE full-outer join — the at-scale physical strategy.

    ``build_changeset`` + ``merge_dataframes`` is the faithful leg-by-leg
    composition of the reference (J1 ∪ J2 ∪ J3, then the merge's anti join):
    four shuffles over the target. This fused form computes the identical final
    table (bag-equal; pinned by tests across every toggle combination) with a
    single key-shuffle of each side: full-outer join, then per-row
    classification — target-only -> delete leg, source-only -> insert leg,
    both + strictly-newer -> update leg, both otherwise -> untouched.

    Natural keys must be non-null (the reference assumes the same).
    """
    from iceberg_ingestion_spark.model import MergeOptions

    options = options or MergeOptions()
    t, s = target.alias("t"), source.alias("s")
    key_eq = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in spec.natural_keys]
    j = t.join(s, on=key_eq, how="full_outer")

    k0 = spec.natural_keys[0]
    t_present = F.col(f"t.{k0}").isNotNull()
    s_present = F.col(f"s.{k0}").isNotNull()
    newer = F.lit(True)
    for u in spec.updated_at_fields:
        newer = newer & (F.col(f"s.{u}") > F.col(f"t.{u}"))

    already_deleted = (
        F.col(f"t.{soft_delete_col}") == F.lit(True)
        if soft_delete_col and soft_delete_col in target.columns
        else F.lit(False)
    )
    take_source = (s_present & ~t_present & F.lit(options.insert)) | (
        s_present & t_present & newer & F.lit(options.update)
    )
    is_delete = (
        t_present
        & ~s_present
        & F.lit(include_deletes and options.delete)
        & ~already_deleted
    )
    changed = take_source | (is_delete & F.lit(keep_deletes))
    keep_row = F.when(
        t_present & ~s_present, ~is_delete | F.lit(keep_deletes)
    ).when(~t_present, F.lit(options.insert)).otherwise(F.lit(True))

    payload = set(source.columns)
    out_cols: list = []
    seen = set()
    for c in target.columns:
        seen.add(c)
        if c == HARD_DELETED_COL and keep_deletes:
            out_cols.append(
                F.when(is_delete, F.lit(True))
                .when(changed, F.lit(False))
                .otherwise(F.coalesce(F.col(f"t.{c}"), F.lit(False)))
                .cast("boolean")
                .alias(c)
            )
        elif c in payload:
            out_cols.append(
                F.when(take_source, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        elif c == INGESTION_DATETIME_COL and ingestion_ts is not None:
            out_cols.append(
                F.when(changed, F.lit(ingestion_ts).cast("timestamp"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        else:
            # target-only column: the leg path nulls it on changed rows
            # (change-set carries only the source payload)
            out_cols.append(
                F.when(changed, F.lit(None)).otherwise(F.col(f"t.{c}")).alias(c)
            )
    for c in source.columns:
        if c not in seen:
            out_cols.append(F.when(take_source, F.col(f"s.{c}")).alias(c))
            seen.add(c)
    if ingestion_ts is not None and INGESTION_DATETIME_COL not in seen:
        out_cols.append(
            F.when(changed, F.lit(ingestion_ts).cast("timestamp")).alias(
                INGESTION_DATETIME_COL
            )
        )
        seen.add(INGESTION_DATETIME_COL)
    if keep_deletes and HARD_DELETED_COL not in seen:
        out_cols.append(
            F.when(is_delete, F.lit(True))
            .when(changed, F.lit(False))
            .otherwise(F.lit(False))
            .cast("boolean")
            .alias(HARD_DELETED_COL)
        )

    return j.filter(keep_row).select(*out_cols)


def merge_into_sql(
    target_table: str,
    changes_view: str,
    spec: ChangeSpec,
    keep_deletes: bool = False,
) -> str:
    """Build the Iceberg ``MERGE INTO`` statement (reference ``iceberg.py:235-244``).

    EXECUTION-PINNED: ``tests/test_merge_sql_semantics.py`` parses this
    statement with Spark's own SQL parser, executes the parsed clauses through
    a generic MERGE interpreter (conditions evaluated by DuckDB), and asserts
    bag-identity with :func:`merge_dataframes` across the full toggle matrix —
    including a tripwire showing the reference's unconditional INSERT * would
    fail the suite. Editing this SQL in a way that diverges semantically from
    the DataFrame merge breaks those tests.

    NOT MATCHED clause, by mode — chosen so this SQL path and
    :func:`merge_dataframes` resolve every case identically:

    - ``keep_deletes=False``: ``WHEN NOT MATCHED AND source.op != 'D' THEN
      INSERT *``. DELIBERATE DIVERGENCE from the reference, which inserts
      unconditionally (``iceberg.py:243``) and therefore resurrects a CDC
      delete whose key is already absent as a normal row. A delete of an
      absent key is a no-op, which is also what ``merge_dataframes`` computes
      (op='D' rows are filtered before the union, ``merge.py:65``).
    - ``keep_deletes=True``: ``WHEN NOT MATCHED THEN INSERT *`` — the
      reference's unconditional insert is CORRECT here, because the change
      rows carry the soft-delete rewrite (``hard_deleted=true`` for op='D',
      applied by the sink before registering the view): an absent-key delete
      materializes as a tombstone, exactly like ``merge_dataframes`` unioning
      the full flagged change-set.
    """
    on = " AND ".join(f"target.{k} = source.{k}" for k in spec.natural_keys)
    delete_action = "UPDATE SET *" if keep_deletes else "DELETE"
    not_matched = (
        "WHEN NOT MATCHED THEN INSERT *"
        if keep_deletes
        else f"WHEN NOT MATCHED AND source.{spec.op_col} != 'D' THEN INSERT *"
    )
    return f"""
        MERGE INTO {target_table} AS target
        USING {changes_view} AS source
        ON {on}
        WHEN MATCHED AND source.{spec.op_col} = 'D' THEN {delete_action}
        WHEN MATCHED AND source.{spec.op_col} = 'U' THEN UPDATE SET *
        {not_matched}
    """
