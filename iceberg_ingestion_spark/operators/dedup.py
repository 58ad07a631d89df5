"""Deduplication operators: exact, fingerprint, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine near-dup.

Scale design (the point of each variant):

- exact / fingerprint: one hash-groupBy shuffle — the cheap first pass.
- n-gram Jaccard (exact): shingle inverted-index self-join — exact pair
  similarities without an O(n²) cross join; cost is bounded by shingle
  collision counts. The scalable *exact* method.
- MinHash+LSH: constant-size signatures (double-hashing Kirsch-Mitzenmacher
  scheme) + banding, so candidate generation is a bucket equi-join whose cost
  is independent of corpus size; candidates are exactly verified. The 100 TB
  path: tune (bands, rows) for the target threshold; with b=32, r=4 a 0.9-sim
  pair is missed with prob (1-0.9^4)^32 ≈ 1e-15.
- SimHash: 60-bit signature, hamming-distance pairs — near-dup at one BIGINT
  per doc; at scale, band the signature bits to avoid the quadratic compare.
- embedding cosine: exact threshold-pairs baseline (block-nested join); the
  scale path is the LSH variant in similarity.py.

All JVM-side expressions; hashes are md5-derived so the DuckDB oracles compute
bit-identical values (see text.hex_to_long).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators.text import hex_to_long, tokens

#: MinHash double-hashing modulus (prime < 2^31; h1 + i*h2 stays < 2^63).
MINHASH_PRIME = 2_147_483_647


def shingles_all(text: Column | str, k: int = 3) -> Column:
    """All k-word shingles (space-joined, duplicates kept) of lower-cased text."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)])
    )


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles (space-joined) of lower-cased text."""
    return F.array_distinct(shingles_all(text, k))


def shingle_table(df: DataFrame, id_col: str, text_col: str = "text", k: int = 3) -> DataFrame:
    """Exploded (id, shingle) relation — the inverted-index input."""
    return df.select(
        F.col(id_col), F.explode(shingles(text_col, k)).alias("shingle")
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, ss: array<string>) — per-doc distinct shingle arrays, computed in a
    pandas kernel. Semantically identical to :func:`shingles` (same tokenizer:
    ``\\s+`` split of trimmed lower-cased text; same first-occurrence dedup)
    but ~an order of magnitude faster: Catalyst evaluates higher-order lambda
    expressions interpreted per array element, while the kernel is plain Python
    string ops over Arrow batches. Shingling is the hot leaf under every
    Jaccard/MinHash op, so this is the one text expression worth the UDF."""
    import re

    ws = re.compile(r"\s+")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ss = [
                list(
                    dict.fromkeys(
                        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
                    )
                )
                for toks in (ws.split(t.strip().lower()) for t in pdf[text_col])
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "ss": ss})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, ss array<string>"
    )


def shingle_counts(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, n_grams, n_distinct) — total and distinct k-gram counts per doc,
    same tokenizer/shingling as :func:`shingle_sets`, one pandas pass (feeds
    repetition-ratio style quality gates without materializing the arrays)."""
    import re

    ws = re.compile(r"\s+")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            n_all, n_dist = [], []
            for t in pdf[text_col]:
                toks = ws.split(t.strip().lower())
                grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
                n_all.append(len(grams))
                n_dist.append(len(set(grams)))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_grams": n_all, "n_distinct": n_dist}
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, n_grams long, n_distinct long"
    )


def exact_dedup(df: DataFrame, subset: list[str]) -> DataFrame:
    """Exact deduplication on ``subset`` (hash-groupBy; one shuffle)."""
    return df.dropDuplicates(subset)


def duplicate_groups(df: DataFrame, id_col: str, key: Column, min_count: int = 2) -> DataFrame:
    """Group rows by an exact key (e.g. fingerprint_md5); emit one row per
    duplicate group with the kept (minimum) id and the group size."""
    return (
        df.select(F.col(id_col), key.alias("dedup_key"))
        .groupBy("dedup_key")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") >= min_count)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard-similar pairs via shingle inverted-index self-join.

    intersection from the shingle join, union by |A|+|B|-∩. Returns
    (id_1, id_2, jaccard) with id_1 < id_2. No cross join: the self-join is an
    equi-join on the shingle, so cost scales with collision counts, not n².
    """
    sets_ = shingle_sets(df, id_col, text_col, k).cache()
    sh = sets_.select(F.col(id_col), F.explode("ss").alias("shingle"))
    sizes = sets_.select(F.col(id_col), F.size("ss").alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, on=(F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_1"), F.col(f"b.{id_col}").alias("id_2"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_1"), F.col("n_shingles").alias("n_1"))
    sb = sizes.select(F.col(id_col).alias("id_2"), F.col("n_shingles").alias("n_2"))
    jac = F.col("n_inter") / (F.col("n_1") + F.col("n_2") - F.col("n_inter"))
    return (
        inter.join(sa, "id_1")
        .join(sb, "id_2")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 128,
) -> DataFrame:
    """MinHash signatures via double hashing: one md5 per shingle supplies two
    48-bit halves h1, h2; permutation i uses (h1 + i*h2) mod P. One shuffle
    (groupBy id) with ``num_hashes`` min-aggregates; signature is an array."""
    sh = shingle_table(df, id_col, text_col, k)
    hexh = F.md5(F.col("shingle"))
    h1 = hex_to_long(hexh, 1, 12) % MINHASH_PRIME
    h2 = hex_to_long(hexh, 13, 12) % MINHASH_PRIME
    hashed = sh.select(F.col(id_col), h1.alias("_h1"), h2.alias("_h2"))
    aggs = [
        F.min((F.col("_h1") + F.lit(i) * F.col("_h2")) % MINHASH_PRIME).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    sig = hashed.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col), F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("minhash")
    )


def minhash_band_entries(
    sets_: DataFrame, id_col: str, num_hashes: int = 128, bands: int = 32
) -> DataFrame:
    """(id, band, bucket) LSH band entries from (id, ss) shingle arrays.

    Pandas kernel computing, per doc, the same values as the expression form in
    :func:`minhash_signatures`: md5 per shingle split into two 48-bit halves
    (mod :data:`MINHASH_PRIME`), permutation ``i`` hashed as ``(h1 + i*h2) % P``
    (Kirsch-Mitzenmacher), per-band bucket = md5 of the comma-joined signature
    slice. The per-shingle × per-permutation min is one vectorized numpy matrix
    per doc instead of ``num_hashes`` interpreted aggregate expressions —
    identical output, an order of magnitude cheaper. No shuffle at all: the
    signature never materializes as a Spark aggregation."""
    import hashlib

    rows = num_hashes // bands

    def kernel(batches):
        import numpy as np
        import pandas as pd

        idx = np.arange(num_hashes, dtype=np.int64)
        for pdf in batches:
            out_id, out_band, out_bucket = [], [], []
            for doc_id, ss in zip(pdf[id_col], pdf["ss"]):
                if len(ss) == 0:
                    continue
                hexes = [hashlib.md5(s.encode()).hexdigest() for s in ss]
                h1 = np.array([int(h[:12], 16) for h in hexes], dtype=np.int64) % MINHASH_PRIME
                h2 = np.array([int(h[12:24], 16) for h in hexes], dtype=np.int64) % MINHASH_PRIME
                sig = ((h1[:, None] + idx[None, :] * h2[:, None]) % MINHASH_PRIME).min(axis=0)
                for b in range(bands):
                    chunk = ",".join(str(v) for v in sig[b * rows : (b + 1) * rows])
                    out_id.append(doc_id)
                    out_band.append(b)
                    out_bucket.append(hashlib.md5(chunk.encode()).hexdigest())
            yield pd.DataFrame({id_col: out_id, "band": out_band, "bucket": out_bucket})

    id_type = dict(sets_.dtypes)[id_col]
    return sets_.mapInPandas(kernel, schema=f"{id_col} {id_type}, band int, bucket string")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 32,
) -> DataFrame:
    """Near-dup pairs: MinHash banding for candidates, exact Jaccard verify.

    Banding: signature split into ``bands`` bands of ``num_hashes/bands`` rows;
    docs sharing any band bucket are candidates (bucket equi-join — no n²).
    Candidates are then verified with the exact shingle Jaccard, so the output
    contains no false positives; false negatives are the banding miss
    probability (≈1e-15 for 0.9-similar pairs at 32×4).
    """
    # One pandas shingling pass feeds BOTH the signature/banding kernel and the
    # exact verification arrays.
    sets_ = shingle_sets(df, id_col, text_col, k).cache()
    band_entries = minhash_band_entries(sets_, id_col, num_hashes, bands)

    ca, cb = band_entries.alias("a"), band_entries.alias("b")
    candidates = (
        ca.join(
            cb,
            on=(F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_1"), F.col(f"b.{id_col}").alias("id_2"))
        .distinct()
    )
    # Exact verification on the CANDIDATES ONLY (not the full corpus): join the
    # cached shingle arrays to each side and intersect per pair — candidate
    # count is banding-bounded, so this stays cheap with no false positives.
    s1 = sets_.select(F.col(id_col).alias("id_1"), F.col("ss").alias("ss_1"))
    s2 = sets_.select(F.col(id_col).alias("id_2"), F.col("ss").alias("ss_2"))
    n_inter = F.size(F.array_intersect(F.col("ss_1"), F.col("ss_2")))
    jac = n_inter / (F.size(F.col("ss_1")) + F.size(F.col("ss_2")) - n_inter)
    return (
        candidates.join(s1, "id_1")
        .join(s2, "id_2")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component) for every id in a pair list — component = minimum id
    reachable through the pair graph (the canonical-survivor convention of a
    dedup pipeline: keep ``id == component``, drop the rest).

    Iterative min-label propagation: each round every node takes the min of
    its own label and its neighbors' labels; converged when no label changes.
    Rounds needed = graph diameter — near-dup clusters are shallow (stars and
    short chains), so this converges in a handful of rounds; each round is one
    equi-join + min-aggregate on the (tiny, pairs-only) label relation, never
    the corpus. ``localCheckpoint`` truncates the iterative lineage so plans
    don't grow with the loop (the standard Spark iterative-algorithm idiom).
    """
    edges = (
        pairs.select(F.col("id_1").alias("src"), F.col("id_2").alias("dst"))
        .unionByName(pairs.select(F.col("id_2").alias("src"), F.col("id_1").alias("dst")))
        .distinct()
        .cache()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "component", F.col("id")
    ).localCheckpoint()
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def simhash_pairs(
    simhashed: DataFrame, id_col: str, max_hamming: int = 8
) -> DataFrame:
    """Pairs of docs whose 60-bit SimHash signatures are within ``max_hamming``.

    Block-nested join at test scale; at 100 TB split the signature into
    (max_hamming+1) bands and equi-join on band value first (pigeonhole: any
    pair within the distance shares at least one exact band)."""
    a = simhashed.select(F.col(id_col).alias("id_1"), F.col("simhash").alias("sh_1"))
    b = simhashed.select(F.col(id_col).alias("id_2"), F.col("simhash").alias("sh_2"))
    ham = F.bit_count(F.col("sh_1").bitwiseXOR(F.col("sh_2")))
    return (
        a.join(b, F.col("id_1") < F.col("id_2"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_1", "id_2", "hamming")
    )
