"""Materialization seam for lineage-truncating eager checkpoints.

Several operators materialize a SMALL-by-construction relation (pruned
candidate pairs, near-dup survivor labels) because it fans into multiple
plan subtrees and each lazy reference would re-expand the whole candidate
lineage in the logical plan — Catalyst planning is super-linear in plan
size (measured 145s -> 9s at the 20x scale smoke from one truncation,
BASELINE.md r7).

The default primitive is ``localCheckpoint(eager=True)``: no setup, fast,
and fine in local mode. On a REAL cluster its blocks live on executors, so
a lost executor (spot kill, dynamic-allocation scale-down) invalidates the
truncated plan with no lineage left to recompute it (VERDICT r7 — the
known localCheckpoint hazard). Production callers pass one of the
storage-backed materializers instead through the operators'
``materializer=`` seam:

- :func:`reliable_checkpoint` — ``df.checkpoint(eager=True)`` to the
  session's fault-tolerant checkpoint dir
  (``spark.sparkContext.setCheckpointDir`` on HDFS/S3 first);
- :func:`parquet_scratch` — write/read-back a scratch parquet table under
  a caller-owned path (survives anything the storage survives, and the
  scratch is inspectable/reusable).

Every materializer has the same contract: same rows out as in, lineage
truncated to a scan (pytest pins output equality AND that the plan does
not re-expand the candidate subtree).
"""

from __future__ import annotations

import itertools
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

#: A lineage-truncating identity: returns a DataFrame with the same rows
#: whose plan is a scan of materialized data, not the input's lineage.
Materializer = Callable[[DataFrame], DataFrame]


def local_checkpoint(df: DataFrame) -> DataFrame:
    """Default: executor-block-backed eager localCheckpoint (fast, no
    setup; NOT fault-tolerant — see module docstring)."""
    return df.localCheckpoint(eager=True)


def reliable_checkpoint(df: DataFrame) -> DataFrame:
    """Fault-tolerant eager checkpoint to the session's checkpoint dir
    (``spark.sparkContext.setCheckpointDir(...)`` must point at reliable
    storage first; Spark raises if unset)."""
    return df.checkpoint(eager=True)


def parquet_scratch(root: str) -> Materializer:
    """Materializer that writes each relation to a fresh scratch parquet
    table under ``root`` (caller-owned path on reliable storage) and
    returns the read-back scan. Paths are ``scratch_0``, ``scratch_1``, …
    per seam instance; ``mode("error")`` refuses to clobber."""
    counter = itertools.count()

    def materialize(df: DataFrame) -> DataFrame:
        path = os.path.join(root, f"scratch_{next(counter)}")
        df.write.mode("error").parquet(path)
        return df.sparkSession.read.parquet(path)

    return materialize


def resolve(materializer: Materializer | None) -> Materializer:
    """The seam's default rule: ``None`` means :func:`local_checkpoint`."""
    return local_checkpoint if materializer is None else materializer
