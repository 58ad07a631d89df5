"""Atomic pointer-swap publication for streamed state tables.

A ``foreachBatch`` maintainer that read-modify-writes a parquet state table
in place has a crash window: ``mode("overwrite")`` deletes the table before
rewriting it, so a failure between delete and write silently resets the
accumulated state (ADVICE r9 on ``kmv_stream``). The shared discipline here
removes that window: each batch writes its new state to a fresh VERSIONED
directory ``<table_dir>.v<batch_id>`` and then atomically repoints
``table_dir`` — a symlink — at it via ``os.replace`` (rename(2) replaces
the symlink itself, never following it). Readers always resolve either the
old or the new complete state; a crash before the swap leaves the previous
version intact, and the half-written version dir is reclaimed when the
batch is redelivered. Versioning also removes the read-modify-write hazard
itself: a batch reads the OLD version and writes a NEW directory, so no
defensive materialization is needed.

Used by ``kmv_stream`` and ``mg_stream``; any maintainer whose state is a
(small) mergeable-summary table can reuse it.
"""

from __future__ import annotations

import os
import shutil


def current_version(table_dir: str) -> str | None:
    """The resolved current version dir, or None if no state exists yet."""
    return os.path.realpath(table_dir) if os.path.isdir(table_dir) else None


def claim_version_dir(table_dir: str, batch_id: int) -> str:
    """Path for this batch's version dir, reclaiming a stale half-written
    one left by a crashed attempt at the same batch id."""
    vdir = f"{table_dir}.v{batch_id}"
    if os.path.exists(vdir):
        shutil.rmtree(vdir)
    return vdir


def publish_version(table_dir: str, vdir: str, prev_target: str | None) -> None:
    """Atomically repoint ``table_dir`` at the fully-written ``vdir`` and
    garbage-collect the superseded version."""
    tmp_link = f"{table_dir}.ptr.tmp"
    if os.path.lexists(tmp_link):
        os.remove(tmp_link)
    os.symlink(vdir, tmp_link)
    if os.path.isdir(table_dir) and not os.path.islink(table_dir):
        # legacy in-place layout (pre-seeded real directory): migrating to
        # the pointer layout is the one non-atomic step, and only happens
        # once — after it every swap is a pure rename
        shutil.rmtree(table_dir)
    os.replace(tmp_link, table_dir)  # atomic: symlink repoint
    if (
        prev_target is not None
        and prev_target != os.path.realpath(table_dir)
        and os.path.isdir(prev_target)
        and not os.path.islink(prev_target)
    ):
        shutil.rmtree(prev_target, ignore_errors=True)
