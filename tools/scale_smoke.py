"""Scale smoke: run the heavy operator paths on a synthetically blown-up corpus
(default 20x sf0.1 = 100k docs / 40k vectors / 3M lineitem rows, built by
unioning id-shifted copies — no testdata writes) and print per-path timings.

The point is trend, not absolutes: if a path is accidentally O(n²) in rows or
collapses onto one task, a 20x input makes it obvious locally long before a
1000-executor run would.

Reference run (local[32], 20x = 100k docs / 40k vecs / 3M orders):
minhash_lsh 58s (the blown-up corpus contains ~1M TRUE near-dup pairs — every
doc has 20 identical copies — so pair output itself is quadratic by
construction), simhash 4.5s (linear map-only), blocked exact cosine 112s
(inherently O(n²) — the IVF/LSH variants are the at-scale path; this is the
oracle baseline), topk_lsh 12s, snapshot merge over 3M keys 39s leg-based / 9s fused
(merge_snapshot_fused: one full-outer join vs four target shuffles).

    python tools/scale_smoke.py [multiplier]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def blow_up(df, id_cols: list[str], mult: int, shift: int = 10_000_000):
    parts = [df]
    for i in range(1, mult):
        shifted = df
        for c in id_cols:
            shifted = shifted.withColumn(c, F.col(c) + F.lit(i * shift))
        parts.append(shifted)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from iceberg_ingestion_spark.changes import build_changeset
    from iceberg_ingestion_spark.merge import merge_dataframes
    from iceberg_ingestion_spark.model import ChangeSpec
    from iceberg_ingestion_spark.operators import dedup, similarity, text
    from iceberg_ingestion_spark.session import build_session

    spark = build_session(app_name="scale-smoke")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()

    docs = blow_up(
        spark.read.parquet(f"{sf}/documents.parquet").repartition(32), ["doc_id"], mult
    ).cache()
    vecs = blow_up(
        spark.read.parquet(f"{sf}/embeddings.parquet").repartition(32), ["vec_id"], mult
    ).cache()
    orders = blow_up(
        spark.read.parquet(f"{sf}/orders.parquet").repartition(32), ["o_orderkey"], mult
    ).cache()
    n_docs, n_vecs, n_orders = docs.count(), vecs.count(), orders.count()
    print(f"corpus: {n_docs} docs, {n_vecs} vectors, {n_orders} orders ({mult}x)")

    def bench(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"{name:35s} {time.time()-t0:7.1f}s")

    bench("minhash_lsh_pairs", dedup.minhash_lsh_pairs(docs, "doc_id", threshold=0.8))
    bench("simhash60", text.simhash60(docs, "doc_id"))
    bench(
        "cosine_pairs_blocked",
        similarity.cosine_pairs_blocked(vecs, "vec_id", "embedding", 64, 0.4),
    )
    bench(
        "topk_lsh (queries=0.1%)",
        similarity.topk_lsh(vecs, "vec_id", "embedding", 64, 5, F.col("vec_id") % 1000 == 0),
    )
    spec = ChangeSpec(("o_orderkey",), ("o_orderdate",))
    half = orders.filter(F.col("o_orderkey") % 2 == 0)
    bench("snapshot_merge (half vs full)", merge_dataframes(
        orders, build_changeset(half, orders, spec), spec
    ))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
