"""Deterministic micro-batch ORDER for multi-drop file feeds drained in one
``availableNow`` run.

Spark's file stream source orders pending files by MODIFICATION TIME, so a
single drain with ``maxFilesPerTrigger=1`` replays drops in mtime order.
For order-sensitive maintainers that is a real hazard (ADVICE r11): on a
coarse-mtime filesystem (or under fast successive writes) two drops can tie
and replay inverted — ``events_stream_windowed`` would advance the watermark
past real events and silently drop their windows as late data, and a
streamed index whose batch 0 builds the frozen codebook
(``sim_ann_stream_pq``) would train on the wrong drop.

:func:`stamp_drop` removes the hazard: after writing drop ``i``, restamp its
data files to the fixed epoch ``_BASE + i`` seconds. The stamps are strictly
increasing and a full second apart (file-source timestamps are millisecond
ints — no rounding can tie them), so the replay order is a deterministic
function of the write sequence, never of filesystem timing. Order-INsensitive
maintainers (KMV/MG/CMS merges, pair-set emission) don't need it — their
graded invariants are batching- and order-independent.
"""

from __future__ import annotations

import os

#: Fixed stamp epoch (2001-09-09T01:46:40Z). Only the RELATIVE order among
#: feed files matters to the source; a constant base keeps re-runs identical.
_BASE = 1_000_000_000.0


def write_drops(df, drop_col, n_drops: int, feed_dir: str) -> None:
    """Write ``n_drops`` one-file-per-drop parquet drops of ``df`` into
    ``feed_dir`` with ONE Spark job, stamped in drop order (r13, guide §1.2
    "don't compute things you throw away": the per-drop ``filter +
    repartition(1) + write`` loop re-scanned the feed's source relation once
    PER DROP — three scan jobs for three drops; partitioning one pass by the
    drop id writes every drop at once).

    ``drop_col`` is an integer Column assigning each row its drop index in
    ``range(n_drops)``. Mechanics: one ``repartition(n_drops, _drop)`` +
    ``partitionBy(_drop)`` write into a staging dir — hash partitioning puts
    all rows of one drop id in one task, and the dynamic-partition writer
    opens one file per drop value per task, so each ``_drop=i`` dir holds
    exactly one data file (same one-file-per-drop contract the
    ``repartition(1)`` loop gave ``maxFilesPerTrigger=1``); the data files
    (which do NOT carry the partition column) are then moved flat into
    ``feed_dir`` and mtime-stamped per drop (:func:`stamp_drop`), so replay
    order stays a deterministic function of the drop index. Every drop must
    be non-empty (an empty drop writes no file and would silently drop a
    micro-batch — refused loudly)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    staging = tempfile.mkdtemp(prefix="drops_staging_")
    try:
        (
            df.withColumn("_drop", drop_col)
            .repartition(n_drops, "_drop")
            .write.mode("overwrite")
            .partitionBy("_drop")
            .parquet(staging)
        )
        os.makedirs(feed_dir, exist_ok=True)
        stamped: set[str] = set()
        for i in range(n_drops):
            src = os.path.join(staging, f"_drop={i}")
            files = (
                [n for n in os.listdir(src) if not n.startswith(("_", "."))]
                if os.path.isdir(src)
                else []
            )
            if not files:
                raise ValueError(
                    f"write_drops: drop {i} of {n_drops} is empty — a missing "
                    "feed file would silently drop its micro-batch"
                )
            for name in files:
                os.rename(os.path.join(src, name), os.path.join(feed_dir, name))
            stamp_drop(feed_dir, i, stamped)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def stamp_drop(feed_dir: str, drop_index: int, stamped: set[str]) -> None:
    """Restamp every not-yet-stamped data file under ``feed_dir`` (one level
    — parquet drop layout) to ``_BASE + drop_index`` and record it in
    ``stamped``. Call immediately after writing each drop, with the same
    ``stamped`` set across the feed's lifetime. Hidden/metadata files
    (``_SUCCESS``, ``.crc``) are ignored — the file source never lists them.
    """
    t = _BASE + float(drop_index)
    for name in os.listdir(feed_dir):
        if name.startswith(("_", ".")):
            continue
        path = os.path.join(feed_dir, name)
        if path in stamped or not os.path.isfile(path):
            continue
        os.utime(path, (t, t))
        stamped.add(path)
