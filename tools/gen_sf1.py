"""Deterministic sf1 testdata: a 10x extension of the driver's sf0.1 tables.

The driver's generator is not shipped (TESTDATA.md: read-only, seed=42), so
sf1 is synthesized FROM sf0.1 with the same discipline the scale smokes use —
no RNG anywhere, every derived value a pure function of base-row values:

- ``region``/``nation``: fixed dimensions, copied verbatim.
- ``customer``/``supplier``/``part``/``orders``/``lineitem``: 10 copies with
  EVERY key column (primary and foreign) shifted by ``i * SHIFT`` in copy i,
  so intra-copy referential integrity is exact and cross-copy joins are
  empty — the join graph scales like real data (10x rows, 10x matches).
  ``SHIFT`` is a multiple of every modulus the fixture calculus uses
  (%10, %20 on o_orderkey), so day1/day2/cdc fixture classes scale uniformly.
- ``events``: 10 copies, event_id/user_id shifted; timestamps untouched
  (same wall-clock window at 10x density — how a growing product behaves).
- ``documents``: copy 0 verbatim; copies i>0 get FRESH text (same token
  count, fully unique tokens derived from (copy, doc_id, position)), so
  vocabulary grows with the corpus and the true near-dup pair set stays
  sparse — identical-copy blowup would make the pair set itself quadratic
  (see scale_smoke.fresh_blow_up). lang/source survive; n_chars is
  recomputed to stay consistent with the new text.
- ``embeddings``: 10 copies; copies i>0 perturb every component by a
  deterministic per-(copy, vec) epsilon (±0.05 band), so vectors are near
  but not equal to their base — ANN recall stays a real measurement instead
  of a duplicate-lookup.

Output: ``/root/repo/.data/sf1/<table>.parquet`` (gitignored, ~170 MB).
Usage: ``python tools/gen_sf1.py [out_dir]``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SHIFT = 10_000_000
MULT = 10
SRC = "/root/testdata/sf0.1"


def copies(df, key_cols, mult=MULT):
    parts = [df]
    for i in range(1, mult):
        shifted = df
        for c in key_cols:
            shifted = shifted.withColumn(
                c, (F.col(c) + F.lit(i * SHIFT)).cast(dict(df.dtypes)[c])
            )
        parts.append(shifted)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fresh_documents(docs, mult=MULT):
    """Copy i>0 rewrites the text as a fresh unique token stream of the same
    length; doc_id shift keeps every %-based fixture class uniform."""
    ntoks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    parts = [docs]
    for i in range(1, mult):
        fresh = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), ntoks),
                lambda j: F.concat(
                    F.lit(f"c{i}d"),
                    F.col("doc_id").cast("string"),
                    F.lit("w"),
                    j.cast("string"),
                ),
            ),
        )
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT))
            .withColumn("text", fresh)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("n_chars", F.length("text").cast("bigint"))


def perturbed_embeddings(emb, mult=MULT):
    """Copy i>0 adds a deterministic epsilon in [-0.05, 0.05) per component:
    eps = ((xxhash64(vec_id, i, pos) mod 1000) / 1000 - 0.5) * 0.1."""
    parts = [emb]
    for i in range(1, mult):
        def eps(x, pos, _i=i):
            h = F.xxhash64(F.col("vec_id"), F.lit(_i), pos)
            return x + ((F.pmod(h, F.lit(1000)) / F.lit(1000.0) - F.lit(0.5))
                        * F.lit(0.1)).cast("float")

        pert = F.transform(
            F.col("embedding"), lambda x, j: eps(x, j)
        ).cast("array<float>")
        parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT))
            .withColumn("embedding", pert)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    from iceberg_ingestion_spark.session import build_session

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf1"
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="gen-sf1")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(t):
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    plans = {
        "region": read("region"),
        "nation": read("nation"),
        "customer": copies(read("customer"), ["c_custkey"]),
        "supplier": copies(read("supplier"), ["s_suppkey"]),
        "part": copies(read("part"), ["p_partkey"]),
        "orders": copies(read("orders"), ["o_orderkey", "o_custkey"]),
        "lineitem": copies(read("lineitem"), ["l_orderkey", "l_partkey", "l_suppkey"]),
        "events": copies(read("events"), ["event_id", "user_id"]),
        "documents": fresh_documents(read("documents")),
        "embeddings": perturbed_embeddings(read("embeddings")),
    }
    for name, df in plans.items():
        # ~8 files per table: enough splits for local[32] scans without
        # thousands of tiny files
        n_files = 1 if name in ("region", "nation") else 8
        df.repartition(n_files).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"{name:12s} written", flush=True)
    for name in plans:
        print(name, spark.read.parquet(f"{out_dir}/{name}.parquet").count())
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
