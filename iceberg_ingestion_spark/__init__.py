"""iceberg_ingestion_spark — a PySpark-native CDC/ELT merge engine.

A clean-room re-design of the capabilities of ``datamindedbe/iceberg-ingestion``
(reference surveyed in SURVEY.md): a declarative upsert/merge calculus over keyed
change-sets (insert/update/delete classification via anti-joins, theta-semi-joins
and window dedup), applied transactionally through a pluggable table sink
(versioned-parquet locally, Iceberg ``MERGE INTO`` when the runtime is present),
plus the table lifecycle (snapshot expiry, orphan removal, compaction) and a
suite of large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, sessionization, multimodal plumbing).

Everything is DataFrame-first: logical plans are declared with the PySpark
DataFrame/SQL API and optimized by Catalyst; no RDDs, no driver-side loops.
"""

from iceberg_ingestion_spark.model import (
    ChangeSpec,
    IngestionType,
    MergeOptions,
    OptimizeMode,
    TablePolicy,
)

__all__ = [
    "ChangeSpec",
    "IngestionType",
    "MergeOptions",
    "OptimizeMode",
    "TablePolicy",
]

__version__ = "0.1.0"
