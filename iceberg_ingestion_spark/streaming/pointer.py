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
    one left by a crashed attempt at the same batch id.

    NEVER reclaims the PUBLISHED target (ADVICE r10 high): if the plain
    ``.v<batch_id>`` dir is what ``table_dir`` currently resolves to — a
    crash landed between ``os.replace`` and the streaming-checkpoint
    commit, or a rerun with a fresh checkpoint reuses a batch id while the
    pointer still targets it — deleting it would destroy the live state the
    redelivered batch is about to read. Instead the claim moves to an
    attempt-suffixed dir ``.v<batch_id>.<attempt>``; superseded versions
    are garbage-collected by POINTER (``publish_version`` removes the
    previous realpath target), never by batch id, so the live target is
    structurally un-reclaimable."""
    live = os.path.realpath(table_dir) if os.path.isdir(table_dir) else None
    attempt = 0
    while True:
        suffix = f".{attempt}" if attempt else ""
        vdir = f"{table_dir}.v{batch_id}{suffix}"
        if os.path.exists(vdir):
            if live is not None and os.path.realpath(vdir) == live:
                attempt += 1  # published target: claim the next attempt dir
                continue
            shutil.rmtree(vdir)  # stale half-written attempt — safe to reclaim
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
