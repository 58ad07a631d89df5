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
