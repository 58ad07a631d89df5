"""Large-scale training-data-pipeline operators (north-star extensions,
SURVEY §7.5): deduplication, similarity search, text analysis, sessionization,
multimodal column plumbing.

All operators are DataFrame-native (JVM-side expressions, whole-stage codegen)
except where Arrow-batched Pandas UDFs are genuinely required (multimodal
decode). No driver-side collects anywhere — every operator is a distributed
plan that scales with partitions.
"""
