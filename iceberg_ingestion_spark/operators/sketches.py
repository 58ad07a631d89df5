"""Approximate (sketch-based) analytics: cardinality and quantiles.

At 100 TB, exact COUNT(DISTINCT) and exact quantiles force wide shuffles of
the full key set; sketches trade bounded error for one map-side pass +
constant-size merge. These wrap Spark's built-ins (HyperLogLog++ and the
Greenwald-Khanna epsilon-approximate quantile) with the error contract stated
and pinned by tests — they have no cross-engine oracle because sketch
implementations differ by engine (the driver records rows-only for such ops;
the exact counterparts in the query suite are the correctness anchors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.02
) -> DataFrame:
    """HLL++ distinct count per group; relative standard deviation ``rsd``
    (memory per group ~ 1/rsd², independent of cardinality)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct")
    )


def approx_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probabilities: list[float],
    relative_error: float = 0.01,
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles per group: rank error bounded by
    ``relative_error * n`` with sketch size O(1/relative_error).

    Output is one SCALAR row per (group, probability): ``(*group_cols,
    probability, value)`` — never an array column, so results sort/hash
    cleanly in any downstream harness (arrays are unhashable in pandas
    canonicalization)."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    agg = df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, probabilities, int(1.0 / relative_error)
        ).alias("_qs")
    )
    return agg.select(
        *group_cols, F.posexplode("_qs").alias("_i", "value")
    ).select(
        *group_cols,
        F.element_at(probs, F.col("_i") + 1).alias("probability"),
        "value",
    )


def _cms_buckets(value, depth: int, width: int):
    """The ``depth`` CMS bucket ids of one value as an array: disjoint 32-bit
    slices of a SINGLE md5, mod width (Kirsch-Mitzenmacher double-hashing —
    the same one-digest-many-hashes trick ``dedup.minhash_signatures`` uses).
    One md5 per row instead of one per (row, seed): 4× less hashing on the
    hot leaf, and the DuckDB mirror is
    ``('0x' || substr(md5(v), 1 + 8*seed, 8))::BIGINT % width``."""
    from iceberg_ingestion_spark.operators.text import hex_to_long

    if depth > 4:
        raise ValueError("depth > 4 would exceed md5's 32 hex chars")
    h = F.md5(value.cast("string"))
    return F.array(*[hex_to_long(h, 1 + 8 * i, 8) % width for i in range(depth)])


def count_min_table(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Count-Min sketch of a value column as a RELATION: ``(seed, bucket,
    cnt)`` with ``depth × width`` cells total, regardless of corpus size.

    The d hash rows are md5-derived (see :func:`_cms_buckets`), so any engine
    — including the DuckDB oracle — computes the identical sketch; no
    engine-private hash in the contract. Plan: one md5 + ``depth``-way
    posexplode of small ints, then ONE aggregation whose key space is the d·w
    cell grid — partial (map-side) aggregation collapses each task's
    contribution to at most d·w rows before the shuffle, so shuffle volume is
    O(tasks · d · w), independent of row count. This is the 100 TB answer to
    per-key exact counts when the key space itself is too large to shuffle
    (heavy_hitters_exact needs 1/min_fraction candidates; CMS has no support
    floor).
    """
    cells = df.select(
        F.posexplode(_cms_buckets(F.col(value_col), depth, width)).alias(
            "seed", "bucket"
        )
    )
    return cells.groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def count_min_estimate(
    cms: DataFrame, probes: DataFrame, value_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Point-estimate counts for a probe relation against a
    :func:`count_min_table` sketch: ``est = min over seeds of cell count``.
    Returns ``(value, est_cnt)``.

    The sketch is d·w rows → broadcast; probing is a map-side broadcast join,
    never a shuffle of the probed relation. CMS guarantees est >= true count
    always, and est <= true + ε·N with probability 1-δ (ε = e/width,
    δ = e^-depth) — both checked in-query by the driver entry.
    """
    probe_cells = probes.select(
        F.col(value_col).cast("string").alias("_v"),
        F.posexplode(_cms_buckets(F.col(value_col), depth, width)).alias(
            "seed", "bucket"
        ),
    )
    joined = probe_cells.join(F.broadcast(cms), ["seed", "bucket"])
    return joined.groupBy(F.col("_v").alias("value")).agg(
        F.min("cnt").alias("est_cnt")
    )


def heavy_hitters_exact(
    df: DataFrame, col: str, min_fraction: float = 0.01
) -> DataFrame:
    """EXACT frequent items (count >= min_fraction of all rows) WITHOUT
    shuffling the full key space — the two-pass heavy-hitters pattern:

    1. candidate pass: Spark's merge-based ``freqItems`` (a Karp-style
       counter sketch; map-side + constant-size merge) returns a SUPERSET
       of every item above the support, at most ~1/min_fraction candidates
       — a bounded driver collect (the codebook pattern), never the key
       space;
    2. confirm pass: exact counts for the candidate set only (scan-side
       ``isin`` filter, then a groupBy over <= 1/min_fraction keys), plus
       the total row count folded into the same pass via a global rollup.

    At 100 TB with billions of distinct values, a naive groupBy-count
    shuffles every key; this shuffles at most ~1/min_fraction of them. The
    result is exact (sketch false positives are filtered by the confirm
    counts; false negatives are impossible by the freqItems guarantee).
    Output: (value, n_rows, fraction), descending.
    """
    cands = df.stat.freqItems([col], min_fraction).first()[f"{col}_freqItems"]
    if not cands:
        # empty result with the SAME schema as the non-empty path (value
        # keeps the column's own type, not a hardcoded string)
        return df.limit(0).select(
            F.col(col).alias("value"),
            F.lit(0).cast("long").alias("n_rows"),
            F.lit(0.0).alias("fraction"),
        )
    total = df.count()
    counts = (
        df.where(F.col(col).isin(list(cands)))
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return (
        counts.withColumn("fraction", F.col("n_rows") / F.lit(total))
        .where(F.col("n_rows") >= F.lit(float(min_fraction)) * F.lit(total))
        .orderBy(F.col("n_rows").desc(), "value")
    )


def hll_sliding_distinct(
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    window_buckets: int = 7,
    lgk: int = 12,
) -> DataFrame:
    """Trailing-window distinct counts from MERGEABLE per-bucket HLL sketches.

    The 100 TB pattern this pins: build ONE Datasketches HLL sketch per time
    bucket (map-side partial agg, constant size per bucket), then answer every
    trailing ``window_buckets``-bucket question by UNIONING the window's
    sketches — the raw data is scanned exactly once, and the windowed rollup
    shuffles only ``n_buckets * window_buckets`` sketch rows of ~``2^lgk``
    bytes each, independent of event volume or key cardinality. An exact
    windowed COUNT(DISTINCT) would instead re-shuffle the full (bucket, value)
    pair set per window.

    ``bucket_col`` must be integral (e.g. a day index). Window anchors are the
    OBSERVED buckets only: each bucket's sketch contributes to anchors
    ``[bucket, bucket + window_buckets)``, semi-joined against the observed
    set. Returns ``(bucket_col, approx_distinct)`` where each row estimates
    distincts over ``[bucket - window_buckets + 1, bucket]``. Estimates are
    deterministic for a fixed input (sketch union is commutative), error is
    the standard HLL bound ~``1.04 / sqrt(2^lgk)`` relative std-dev.

    Composed from :func:`hll_bucket_sketches` + :func:`hll_window_union` so a
    STREAM-maintained sketch table (``streaming/sketch_stream.py``) answers
    the same windowed questions through the same union path.
    """
    return hll_window_union(
        hll_bucket_sketches(df, bucket_col, value_col, lgk),
        bucket_col,
        window_buckets,
    )


def hll_bucket_sketches(
    df: DataFrame, bucket_col: str, value_col: str, lgk: int = 12
) -> DataFrame:
    """One HLL sketch per bucket: ``(bucket_col, sketch)`` with the sketch as
    a binary column — constant ~``2^lgk`` bytes per bucket, mergeable with
    ``hll_union_agg`` (so two of these relations union by re-aggregating,
    which is what the streaming maintenance loop does per micro-batch)."""
    return df.groupBy(bucket_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    )


def hll_window_union(
    sketches: DataFrame, bucket_col: str, window_buckets: int
) -> DataFrame:
    """Trailing-window distinct estimates from a per-bucket sketch relation
    (``(bucket_col, sketch)``, e.g. :func:`hll_bucket_sketches` output or a
    stream-maintained sketch table): each bucket's sketch is exploded to the
    window anchors it serves, semi-joined to observed anchors, unioned per
    anchor. Shuffles ``n_buckets * window_buckets`` sketch rows — never the
    raw data."""
    b = F.col(bucket_col)
    anchors = sketches.select(bucket_col).distinct()
    contrib = sketches.select(
        F.explode(F.sequence(b, b + F.lit(window_buckets - 1))).alias(bucket_col),
        "sketch",
    )
    return (
        contrib.join(anchors, bucket_col, "left_semi")
        .groupBy(bucket_col)
        .agg(F.hll_union_agg("sketch").alias("_sk"))
        .select(bucket_col, F.hll_sketch_estimate("_sk").alias("approx_distinct"))
    )


# ---------------------------------------------------------------------------
# KMV (k minimum values) — md5-derived, cross-engine recomputable
# ---------------------------------------------------------------------------


def kmv_sketch(df: DataFrame, set_col: str, value_col: str, k: int) -> DataFrame:
    """KMV distinct-count sketch per set (Bar-Yossef et al. RANDOM'02; Beyer
    et al. SIGMOD'07): the ``k`` lexicographically-smallest ``(hash, value)``
    pairs over DISTINCT values of each set, with the hash the first 32 bits
    of md5 — so ANY engine (including the DuckDB oracle) recomputes the
    identical sketch; no engine-private hash in the contract.

    Output: ``(set_col, value string, hv long)`` with ≤ k rows per set.

    Scale shape — two-level tournament, the classic distributed top-k: the
    first rank is keyed by (physical partition, set), so the full distinct
    relation shuffles across P·|sets| keys — no single hot reducer per set —
    and each key prunes to its own k smallest. Top-k is partition-stable
    (the global k-min of a union of per-partition k-mins is exact), so the
    second, per-set window sees ≤ k·P rows per set, never the distinct
    value space."""
    from iceberg_ingestion_spark.operators.text import hex_to_long
    from pyspark.sql import Window

    d = (
        df.select(
            F.col(set_col).alias(set_col),
            F.col(value_col).cast("string").alias("value"),
        )
        .distinct()
        .withColumn("hv", hex_to_long(F.md5(F.col("value")), 1, 8))
    )
    local = Window.partitionBy(F.spark_partition_id(), set_col).orderBy("hv", "value")
    pruned = d.withColumn("_lr", F.row_number().over(local)).where(
        F.col("_lr") <= k
    )
    w = Window.partitionBy(set_col).orderBy("hv", "value")
    return (
        pruned.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .select(set_col, "value", "hv")
    )


def kmv_distinct_estimate(sketch: DataFrame, set_col: str, k: int) -> DataFrame:
    """Distinct estimate per set from a :func:`kmv_sketch` relation:
    ``(k-1) · 2^32 / h_k`` when the sketch is full (h_k = k-th smallest
    32-bit hash), EXACT slot count when the set has fewer than k distinct
    values. Output: ``(set_col, n_slots, est_distinct double)``. RSE ≈
    1/√(k−2). Every arithmetic step is one IEEE op on exactly-representable
    integers, so the oracle's double is bit-identical."""
    agg = sketch.groupBy(set_col).agg(
        F.count(F.lit(1)).alias("n_slots"), F.max("hv").alias("_hk")
    )
    full = F.lit(float((k - 1) * 4294967296)) / F.col("_hk")
    return agg.select(
        set_col,
        "n_slots",
        F.when(F.col("n_slots") < k, F.col("n_slots").cast("double"))
        .otherwise(full)
        .alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Misra-Gries mergeable heavy-hitter summaries — deterministic, md5-sub-bags
# ---------------------------------------------------------------------------


def mg_summary_merged(
    counts: DataFrame, part_col: str, value_col: str, count_col: str, k: int
) -> DataFrame:
    """Merged Misra-Gries heavy-hitter summary over md5-deterministic
    sub-bags (Agarwal et al., "Mergeable Summaries", PODS'12): per sub-bag
    ``part_col``, prune exact ``(value, count)`` rows by the MG offset — the
    (k+1)-th largest count in that sub-bag (0 if ≤ k distinct values) —
    keeping ``max(0, count - offset)``; then merge by summing surviving
    counters across sub-bags.

    Determinism: the MG summary of a sub-bag in "optimal offset" form depends
    only on the sub-bag's exact counts, not on stream order — and the sub-bag
    assignment is md5-derived by the caller — so any engine recomputes the
    identical summary (the DuckDB oracle does).

    Guarantees (checked in-query by the driver entry, integer-exact):
    ``est ≤ true`` and ``true − est ≤ Σ_p offset_p ≤ N/(k+1)``.

    Output: ``(value, est_cnt)``, ≤ k rows per sub-bag before the merge.
    Scale shape: the groupBy feeding ``counts`` is map-side partial; the
    prune window is keyed by sub-bag over that aggregated relation; the
    merge moves ≤ k·P counter rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(part_col).orderBy(
        F.col(count_col).desc(), F.col(value_col)
    )
    ranked = counts.withColumn("_r", F.row_number().over(w))
    off = ranked.where(F.col("_r") == k + 1).select(
        F.col(part_col), F.col(count_col).alias("_off")
    )
    pruned = (
        ranked.join(off, part_col, "left")
        .withColumn("_est", F.col(count_col) - F.coalesce(F.col("_off"), F.lit(0)))
        .where(F.col("_est") > 0)
    )
    return pruned.groupBy(F.col(value_col).alias("value")).agg(
        F.sum("_est").alias("est_cnt")
    )


def kmv_merge(a: DataFrame, b: DataFrame, set_col: str, k: int) -> DataFrame:
    """Merge two KMV sketch relations (``(set, value, hv)``) back to ≤ k
    rows per set. KMV is a mergeable summary: the k smallest of A ∪ B equals
    the k smallest of kmin(A) ∪ kmin(B), so merging is union + re-prune —
    and re-merging the same rows is a no-op (set semantics via distinct),
    which is what makes streamed maintenance idempotent under micro-batch
    redelivery."""
    from pyspark.sql import Window

    u = a.unionByName(b).distinct()
    w = Window.partitionBy(set_col).orderBy("hv", "value")
    return (
        u.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .select(set_col, "value", "hv")
    )
