"""The change calculus: classify source rows as Insert / Update / Delete.

Pure ``DataFrame -> DataFrame`` functions reproducing the semantic heart of the
reference (``src/data_ingestion/common/iceberg.py:151-231``): insert detection by
left-anti join (``iceberg.py:167-170``), delete detection by reversed left-anti
join over not-yet-deleted target rows (``iceberg.py:178-183``), update detection
by left-semi join with a strictly-newer theta conjunct (``iceberg.py:162,
189-194`` — equal timestamps are NOT updates), CDC latest-row-per-key dedup by
window ``row_number`` (``iceberg.py:203-216``), and change-set assembly
(``iceberg.py:165-231``).

Scale notes (100 TB stance):
- every leg is a key-equi join, so Catalyst shuffles on the natural keys and AQE
  broadcast-converts whichever side turns out small (a daily diff usually is);
- the three legs share the same join keys, so the shuffle exchange of the source
  and target is reused across legs rather than recomputed;
- the reference's hard-coded ``changes.repartition(1)`` (``iceberg.py:220-221``)
  is deliberately NOT reproduced — at 100 TB a single-partition change-set is a
  driver-killer; AQE coalescing achieves the same small-file goal adaptively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from iceberg_ingestion_spark.model import (
    HARD_DELETED_COL,
    INGESTION_DATETIME_COL,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    ROW_NUMBER_COL,
    ChangeSpec,
    MergeOptions,
)

SOURCE_ALIAS = "source"
TARGET_ALIAS = "target"


def _key_condition(spec: ChangeSpec) -> Column:
    """``source.k = target.k`` conjunction (reference ``iceberg.py:161``)."""
    cond = F.lit(True)
    for k in spec.natural_keys:
        cond = cond & (F.col(f"{SOURCE_ALIAS}.{k}") == F.col(f"{TARGET_ALIAS}.{k}"))
    return cond


def _newer_condition(spec: ChangeSpec) -> Column:
    """``source.u > target.u`` (strict) conjunction (reference ``iceberg.py:162``)."""
    cond = F.lit(True)
    for u in spec.updated_at_fields:
        cond = cond & (F.col(f"{SOURCE_ALIAS}.{u}") > F.col(f"{TARGET_ALIAS}.{u}"))
    return cond


def empty_like(df: DataFrame) -> DataFrame:
    """Schema-preserving empty relation for disabled legs (reference ``iceberg.py:159``)."""
    return df.sparkSession.createDataFrame([], df.schema)


def detect_inserts(source: DataFrame, target: DataFrame, spec: ChangeSpec) -> DataFrame:
    """Source rows whose natural key is absent from the target (reference
    ``iceberg.py:167-170``). Returns the source payload + ``op = 'I'``."""
    out = (
        source.alias(SOURCE_ALIAS)
        .join(target.alias(TARGET_ALIAS), on=_key_condition(spec), how="left_anti")
        .withColumn(spec.op_col, F.lit(OP_INSERT))
    )
    return out


def detect_deletes(
    source: DataFrame,
    target: DataFrame,
    spec: ChangeSpec,
    soft_delete_col: str | None = None,
) -> DataFrame:
    """Target rows whose natural key is absent from the source (reference
    ``iceberg.py:178-183``) — full-load mode only; ``incremental`` skips this leg
    (``iceberg.py:177-178``). Rows already soft-deleted are excluded
    (``iceberg.py:183``: ``hard_deleted == false`` filter). Returns the TARGET
    payload + ``op = 'D'``."""
    tgt = target
    if soft_delete_col and soft_delete_col in target.columns:
        tgt = tgt.filter(F.col(soft_delete_col) == F.lit(False))
    out = (
        tgt.alias(TARGET_ALIAS)
        .join(source.alias(SOURCE_ALIAS), on=_key_condition(spec), how="left_anti")
        .withColumn(spec.op_col, F.lit(OP_DELETE))
    )
    return out


def detect_updates(source: DataFrame, target: DataFrame, spec: ChangeSpec) -> DataFrame:
    """Source rows whose key exists in the target AND whose updated-at fields are
    STRICTLY newer (reference ``iceberg.py:162,189-194``; equal timestamps are not
    updates — pinned by tests). Returns the source payload + ``op = 'U'``."""
    out = (
        source.alias(SOURCE_ALIAS)
        .join(
            target.alias(TARGET_ALIAS),
            on=_key_condition(spec) & _newer_condition(spec),
            how="left_semi",
        )
        .withColumn(spec.op_col, F.lit(OP_UPDATE))
    )
    return out


def dedup_latest(cdc: DataFrame, spec: ChangeSpec) -> DataFrame:
    """Latest row per natural key within a CDC batch (reference
    ``iceberg.py:203-216``): window partitioned by keys, ordered by updated-at
    fields DESC, keep ``row_number == 1``. Ties between exact-duplicate
    timestamps pick one survivor nondeterministically, matching the reference;
    pass deterministic data (or extend ``updated_at_fields``) when determinism
    is required."""
    w = Window.partitionBy(*[F.col(k) for k in spec.natural_keys]).orderBy(
        *[F.col(u).desc() for u in spec.updated_at_fields]
    )
    return (
        cdc.withColumn(ROW_NUMBER_COL, F.row_number().over(w))
        .filter(F.col(ROW_NUMBER_COL) == 1)
        .drop(ROW_NUMBER_COL)
    )


def stamp_audit(df: DataFrame, ingestion_ts, overwrite: bool = True) -> DataFrame:
    """Add the ``ingestion_datetime`` audit column (reference ``iceberg.py:38,
    105,128,169,...``)."""
    if not overwrite and INGESTION_DATETIME_COL in df.columns:
        return df
    return df.withColumn(INGESTION_DATETIME_COL, F.lit(ingestion_ts).cast("timestamp"))


def with_soft_delete_flag(df: DataFrame, op_col: str) -> DataFrame:
    """``hard_deleted = (op == 'D')`` rewrite (reference ``iceberg.py:224-227``)."""
    return df.withColumn(
        HARD_DELETED_COL,
        F.when(F.col(op_col) == OP_DELETE, F.lit(True)).otherwise(F.lit(False)).cast("boolean"),
    )


def build_changeset(
    source: DataFrame,
    target: DataFrame,
    spec: ChangeSpec,
    options: MergeOptions = MergeOptions(),
    ingestion_ts=None,
    include_deletes: bool = True,
    soft_delete_col: str | None = None,
) -> DataFrame:
    """Snapshot diff: union of the I/U/D legs (reference ``iceberg.py:165-231``).

    Disabled legs are replaced by schema-preserving empty relations (reference
    ``iceberg.py:159``). The union is by NAME (``unionByName``), fixing the
    reference's fragile positional ``union`` (``iceberg.py:201``). The delete leg
    carries the target payload; audit columns on the target are dropped so all
    legs share the source schema + ``op``.
    """
    payload_cols = list(source.columns)
    tgt_payload = target.select(
        *[c for c in target.columns if c in payload_cols]
    )

    inserts = (
        detect_inserts(source, target, spec)
        if options.insert
        else empty_like(source).withColumn(spec.op_col, F.lit(OP_INSERT))
    )
    updates = (
        detect_updates(source, target, spec)
        if options.update
        else empty_like(source).withColumn(spec.op_col, F.lit(OP_UPDATE))
    )
    if include_deletes and options.delete:
        deletes = detect_deletes(source, target, spec, soft_delete_col=soft_delete_col).select(
            *payload_cols, spec.op_col
        )
    else:
        deletes = empty_like(source).withColumn(spec.op_col, F.lit(OP_DELETE))

    changes = inserts.unionByName(updates).unionByName(deletes)
    if ingestion_ts is not None:
        changes = stamp_audit(changes, ingestion_ts)
    return changes


# ---------------------------------------------------------------------------
# Version-to-version changelog (Iceberg incremental-consumption parity)
# ---------------------------------------------------------------------------

#: Iceberg changelog-scan change types (spark ``table_changes`` naming).
CHANGE_TYPE_COL = "_change_type"
CT_INSERT = "INSERT"
CT_DELETE = "DELETE"
CT_UPDATE_BEFORE = "UPDATE_BEFORE"
CT_UPDATE_AFTER = "UPDATE_AFTER"


def build_changelog(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Net row-level changes turning committed snapshot ``old`` into ``new``:
    the batch analogue of Iceberg's changelog scan / ``table_changes``, with
    its change-type vocabulary (INSERT / DELETE / UPDATE_BEFORE /
    UPDATE_AFTER — updates emit pre- AND post-image rows).

    Unlike :func:`detect_updates` (ingest-time, trusts the source's
    ``updated_at`` ordering), a changelog between two already-committed
    versions needs no timestamp contract: an update is a key present in both
    versions whose non-key payload differs (null-safe column compare).

    Scale: all four legs are equi-joins/anti-joins on the natural keys — the
    same shuffle key, so the exchange of each version is reused across legs;
    AQE broadcast-converts the smaller version side. No driver collects.
    """
    non_keys = [c for c in new.columns if c not in keys]
    ct = F.lit  # brevity

    inserts = new.join(old.select(*keys), on=keys, how="left_anti").withColumn(
        CHANGE_TYPE_COL, ct(CT_INSERT)
    )
    deletes = old.join(new.select(*keys), on=keys, how="left_anti").withColumn(
        CHANGE_TYPE_COL, ct(CT_DELETE)
    )

    o, n = old.alias("o"), new.alias("n")
    key_cond = F.lit(True)
    for k in keys:
        key_cond = key_cond & (F.col(f"o.{k}") == F.col(f"n.{k}"))
    differs = F.lit(False)
    for c in non_keys:
        differs = differs | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    changed_pairs = o.join(n, on=key_cond & differs, how="inner")
    before = changed_pairs.select([F.col(f"o.{c}").alias(c) for c in old.columns]).withColumn(
        CHANGE_TYPE_COL, ct(CT_UPDATE_BEFORE)
    )
    after = changed_pairs.select([F.col(f"n.{c}").alias(c) for c in new.columns]).withColumn(
        CHANGE_TYPE_COL, ct(CT_UPDATE_AFTER)
    )
    return inserts.unionByName(after).unionByName(before).unionByName(deletes)


def scd2_from_history(
    history: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing dimension from a bag of row versions.

    Input: every version of every row the pipeline has seen — e.g. the first
    load plus each CDC insert/update image (the same keyed change-set
    abstraction the merge calculus consumes, reference ``iceberg.py:203-216``;
    the reference keeps only the latest version, this operator keeps ALL of
    them with validity ranges, the classic warehouse complement to its
    type-1 merge). Output: each input row plus

    - ``valid_from`` — the version's own ``ts_col``;
    - ``valid_to``   — the NEXT version's ``ts_col`` for the key (NULL for
      the open/current version): half-open ``[valid_from, valid_to)`` ranges
      that tile each key's timeline with no gaps or overlaps;
    - ``is_current`` — ``valid_to IS NULL``.

    Scale: one window over the natural keys — a single hash-partition
    shuffle on the same keys every other calculus stage already uses; each
    partition holds one key's (small) version list, never the corpus. An
    as-of probe against the result is a plain range predicate
    (``valid_from <= t AND (valid_to IS NULL OR t < valid_to)``).
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        history.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )
