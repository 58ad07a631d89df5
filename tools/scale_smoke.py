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

Caps A/B mode (``--caps-ab m1 m2 ...``): measures what the two skew caps
(``max_shingle_df`` on the n-gram inverted index, ``max_band_bucket_size`` on
the MinHash band join) actually buy as the corpus grows. The synthetic corpus
is df-uniform (sf0.1: max shingle df = 25 of 5000 docs = 0.5%, no hot head),
so each hazard is INJECTED in the shape the cap exists for:

- ngram FRESH mode (the headline curve): corpus growth modeled the way real
  corpora grow — every added doc is fresh content (unique token stream, same
  length), so per-shingle df of body content stays FLAT while one shared
  30-token boilerplate paragraph on every 10th doc keeps a hot head whose df
  is 10% of corpus size at every scale. Uncapped, those ~28 boilerplate
  shingles alone emit ~(n/10)^2/2 candidate pairs each — quadratic in corpus
  size; a fractional cap (2% >> body max 0.5%) drops exactly them and the
  curve goes flat.
- ngram SALTED mode (the fixed-cap failure mode, run at small mults only):
  copies of the SAME docs with unique salt tails — body df scales with the
  multiplier (fixed vocabulary), so an absolute df cap that was tuned on the
  base corpus is crossed by the whole body and the exactness-correction
  machinery swallows the index, while a fractional cap tracks corpus size.
- minhash: the base corpus plus 100 hot clusters of 16*mult identical copies
  (a band bucket of B near-identical docs emits B^2 candidates in EVERY band);
  ``max_band_bucket_size=64`` drops those buckets once clusters exceed it.

Each variant runs under a wall-clock limit; a cancelled run prints ``>LIMITs``
(that unbounded growth IS the finding).

    python tools/scale_smoke.py --caps-ab 2 5 20
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


def salted_blow_up(docs, mult: int, shift: int = 10_000_000):
    """mult copies of each doc; copy i>0 gets a unique salt tail as long as the
    doc, so copies are not near-dups of each other or of any other doc (jaccard
    vs any doc <= ~1/3 < every threshold in use) while each base shingle's df
    is exactly mult x its base df."""
    ntoks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    parts = [docs]
    for i in range(1, mult):
        salt = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), ntoks),
                lambda j: F.concat(
                    F.lit(f"c{i}x"), F.col("doc_id").cast("string"), F.lit("w"),
                    j.cast("string"),
                ),
            ),
        )
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
            .withColumn("text", F.concat_ws(" ", F.col("text"), salt))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def bench_cancelable(spark, name: str, df_fn, limit_s: int = 240) -> None:
    """Build (``df_fn()``) + noop-write under a wall-clock limit; cancel +
    report ``>limit`` on overrun instead of hanging the whole smoke. Takes a
    THUNK so eager work at operator-construction time (the ngram hot-set
    collect, the minhash cap's cache materialization) is inside the timer."""
    import threading

    sc = spark.sparkContext
    sc.setJobGroup(name, name, interruptOnCancel=True)
    done = threading.Event()

    def killer():
        if not done.wait(limit_s):
            sc.cancelJobGroup(name)

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    t0 = time.time()
    try:
        df_fn().write.format("noop").mode("overwrite").save()
        verdict = f"{time.time()-t0:7.1f}s"
    except Exception:  # noqa: BLE001 — cancellation surfaces as a generic Py4J error
        verdict = f"   >{limit_s}s (cancelled)"
    finally:
        done.set()
        sc.setJobGroup("", "")
    print(f"{name:45s} {verdict}", flush=True)


def fresh_blow_up(docs, mult: int, shift: int = 10_000_000):
    """mult-1 additional FRESH docs per base doc: same length, fully unique
    token stream. Vocabulary grows with the corpus and per-shingle df of body
    content stays flat — how a real crawl grows; contrast salted_blow_up,
    where a fixed vocabulary's df scales with the multiplier."""
    ntoks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    parts = [docs]
    for i in range(1, mult):
        fresh = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), ntoks),
                lambda j: F.concat(
                    F.lit(f"c{i}x"), F.col("doc_id").cast("string"), F.lit("w"),
                    j.cast("string"),
                ),
            ),
        )
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
            .withColumn("text", fresh)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def with_boilerplate(docs, every: int = 10, tokens: int = 30):
    """Append one shared boilerplate paragraph to every ``every``-th doc (by
    base doc_id, so every salted copy of a chosen doc carries it too): a hot
    head whose shingle df is a FIXED FRACTION (1/every) of corpus size at any
    scale. Short enough (30 tokens vs >=50-token docs) that it creates no new
    >=0.5-jaccard pairs — only candidate mass."""
    para = " ".join(f"bpw{j}" for j in range(tokens))
    return docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % every == 0,
            F.concat_ws(" ", F.col("text"), F.lit(para)),
        ).otherwise(F.col("text")),
    )


def with_hot_clusters(docs, spark, n_clusters: int = 100, size: int = 32,
                      shift: int = 500_000_000):
    """Union ``n_clusters`` clusters of ``size`` IDENTICAL copies of seed docs
    onto the corpus — the MinHash hazard: identical docs share every band
    bucket, so one cluster of B docs emits B^2 candidate rows in each of the
    32 bands unless the bucket cap drops it."""
    seeds = docs.orderBy("doc_id").limit(n_clusters)
    copies = seeds.crossJoin(
        spark.range(size).select(F.col("id").alias("_copy"))
    ).withColumn(
        "doc_id", F.col("doc_id") + (F.col("_copy") + 1) * F.lit(shift)
    ).drop("_copy")
    return docs.unionByName(copies)


def caps_ab(mults: list[int]) -> int:
    from iceberg_ingestion_spark.operators import dedup, text
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-caps")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)

    for mult in mults:
        docs = with_boilerplate(
            base if mult == 1 else fresh_blow_up(base, mult)
        ).cache()
        n = docs.count()
        print(f"\n== ngram FRESH {mult}x: {n} docs (flat body df, 10% boilerplate head) ==")
        bench_cancelable(
            spark, f"ngram fresh UNCAPPED   {mult}x",
            lambda: dedup.ngram_jaccard_pairs(docs, "doc_id", threshold=0.5),
        )
        bench_cancelable(
            spark, f"ngram fresh cap=2%PROP {mult}x",
            lambda: dedup.ngram_jaccard_pairs(
                docs, "doc_id", threshold=0.5, max_shingle_df_frac=0.02,
            ),
        )
        bench_cancelable(
            spark, f"simhash (pigeonhole)   {mult}x",
            lambda: dedup.simhash_pairs(text.simhash60(docs, "doc_id"), "doc_id",
                                        max_hamming=8),
        )
        docs.unpersist()

        if mult <= 5:
            salted = with_boilerplate(
                base if mult == 1 else salted_blow_up(base, mult)
            ).cache()
            n = salted.count()
            print(f"== ngram SALTED {mult}x: {n} docs (body df scales with mult) ==")
            bench_cancelable(
                spark, f"ngram salt UNCAPPED    {mult}x",
                lambda: dedup.ngram_jaccard_pairs(salted, "doc_id", threshold=0.5),
            )
            bench_cancelable(
                spark, f"ngram salt cap=2%PROP  {mult}x",
                lambda: dedup.ngram_jaccard_pairs(
                    salted, "doc_id", threshold=0.5, max_shingle_df_frac=0.02,
                ),
            )
            bench_cancelable(
                spark, f"ngram salt cap=20FIXED {mult}x",
                lambda: dedup.ngram_jaccard_pairs(salted, "doc_id", threshold=0.5,
                                                  max_shingle_df=20),
            )
            salted.unpersist()

        clustered = with_hot_clusters(base, spark, size=16 * mult).cache()
        n = clustered.count()
        print(f"== minhash {mult}x: {n} docs (100 clusters of {16*mult} identical) ==")
        bench_cancelable(
            spark, f"minhash bucket_cap=64 {mult}x",
            lambda: dedup.minhash_lsh_pairs(clustered, "doc_id", threshold=0.8,
                                            max_band_bucket_size=64),
        )
        bench_cancelable(
            spark, f"minhash UNCAPPED      {mult}x",
            lambda: dedup.minhash_lsh_pairs(clustered, "doc_id", threshold=0.8),
        )
        bench_cancelable(
            spark, f"minhash GROUPED       {mult}x",
            lambda: dedup.minhash_lsh_pairs_grouped(
                clustered, "doc_id", threshold=0.8
            ),
        )
        bench_cancelable(
            spark, f"minhash GROUPED star  {mult}x",
            lambda: dedup.minhash_lsh_pairs_grouped(
                clustered, "doc_id", threshold=0.8, equal_expansion="star"
            ),
        )
        clustered.unpersist()
    spark.stop()
    return 0


def ann_curve(mults: list[int]) -> int:
    """ANN-family scale curves: brute / LSH / IVF top-k at growing corpus
    multipliers with a FIXED query fraction (0.1%), plus LSH/IVF recall vs the
    exact brute-force baseline wherever brute completes in the budget.

    Expected shapes: brute is queries x corpus = O(n^2) overall (it exists as
    the exactness baseline, not the scale path); LSH cost tracks bucket
    collision mass, IVF cost tracks nprobe/n_cells of the corpus — both
    near-linear with fixed parameters. Recall must hold at every multiplier:
    a draw- or bucketing-scheme that only works at base scale shows up here.
    """
    from iceberg_ingestion_spark.operators import similarity
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-ann")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/embeddings.parquet").repartition(32)

    for mult in mults:
        vecs = (base if mult == 1 else blow_up(base, ["vec_id"], mult)).cache()
        n = vecs.count()
        qf = F.col("vec_id") % 1000 == 0
        print(f"\n== ANN {mult}x: {n} vectors, {n // 1000} queries ==", flush=True)
        results = {}
        def _trained():
            # trained-vs-hashed A/B at equal nprobe (VERDICT r4 #2): the
            # codebook train (hash-sample + 3 Lloyd rounds) is INSIDE the
            # timed region, so the printed latency is the honest end-to-end
            # cost of the trained path
            cb = similarity.train_ivf_codebook(vecs, "vec_id", "embedding", 64, 16)
            return similarity.topk_ivf(
                vecs, "vec_id", "embedding", 64, 5, qf,
                n_cells=16, nprobe=4, codebook=cb,
            )

        for name, fn in [
            ("brute", lambda: similarity.topk_bruteforce(
                vecs, "vec_id", "embedding", 64, 5, qf)),
            ("lsh", lambda: similarity.topk_lsh(
                vecs, "vec_id", "embedding", 64, 5, qf)),
            ("ivf", lambda: similarity.topk_ivf(
                vecs, "vec_id", "embedding", 64, 5, qf, n_cells=16, nprobe=4)),
            ("ivf_trained", _trained),
            # code build inside the timed region (honest end-to-end);
            # production amortizes it via the persisted codes= path
            ("pq", lambda: similarity.topk_pq(
                vecs, "vec_id", "embedding", 64, 5, qf,
                m=16, n_codes=32, shortlist_mult=16)),
            # trained sub-codebooks (VERDICT r8 #3): per-subspace Lloyd
            # INSIDE the timed region, same probe path — the recall delta
            # at equal (m, n_codes) is the thing under measurement
            ("pq_trained", lambda: similarity.topk_pq(
                vecs, "vec_id", "embedding", 64, 5, qf,
                m=16, n_codes=32, shortlist_mult=16,
                codebooks=similarity.train_pq_codebooks(
                    vecs, "vec_id", "embedding", 64, m=16, n_codes=32))),
            ("ivfpq", lambda: similarity.topk_ivfpq(
                vecs, "vec_id", "embedding", 64, 5, qf,
                n_cells=16, nprobe=6, m=16, n_codes=32, shortlist_mult=16)),
        ]:
            t0 = time.time()
            try:
                df = fn().cache()
                df.write.format("noop").mode("overwrite").save()
                results[name] = df
                print(f"topk_{name:12s} {mult}x {time.time()-t0:7.1f}s", flush=True)
            except Exception as exc:  # noqa: BLE001
                print(f"topk_{name:12s} {mult}x FAILED {exc}", flush=True)
        if "brute" in results:
            exact_pairs = results["brute"].select("query_id", "neighbor_id")
            n_exact = exact_pairs.count()
            for name in ("lsh", "ivf", "ivf_trained", "pq", "pq_trained", "ivfpq"):
                if name not in results:
                    continue
                hits = exact_pairs.join(
                    results[name].select("query_id", "neighbor_id"),
                    ["query_id", "neighbor_id"], "left_semi",
                ).count()
                print(f"recall_{name}   {mult}x {hits}/{n_exact} = {hits/n_exact:.3f}",
                      flush=True)
        for df in results.values():
            df.unpersist()
        vecs.unpersist()
    spark.stop()
    return 0


def skew_curve(mults: list[int]) -> int:
    """Skew stress A/B (VERDICT r4 next-round #6): a 1000x-hot key at growing
    data multipliers, salted vs unsalted, for both the shuffle JOIN and the
    groupBy AGGREGATION shapes.

    Data: events blown up mult x, re-keyed deterministically so key 0 holds
    ~50% of all rows and 1000 cold keys share the rest — key 0 is ~1000x any
    cold key. The dim side is one row per key (1001 rows) — broadcastable in
    real life, so the shuffle-join variants force
    ``autoBroadcastJoinThreshold=-1`` to expose the skew shape AQE/salting
    must solve when the dim side genuinely can't broadcast.

    Variants per multiplier (wall-clock; all materialized via noop write):
    - join_broadcast: the honest best plan when the dim fits (baseline);
    - join_smj_aqe: sort-merge join, AQE skew-join splitting ON (default);
    - join_smj_noskew: SMJ with skew splitting OFF — the unmitigated funnel;
    - join_salted: ``salted_join_hot_keys`` (skew splitting off, so the
      measured effect is the salt's alone);
    - agg_plain vs agg_salted: groupBy sum/count on the hot key —
      EXPECTED near-equal, because hash aggregation's map-side partial
      combine already neutralizes skew for decomposable aggregates; the
      honest conclusion is that ``salted_sum_count`` pays off only where
      partial combine can't (collect_list-style, exact distinct), and that
      is recorded in BASELINE.md rather than wished away.
    """
    from iceberg_ingestion_spark.operators.skew import salted_join_hot_keys, salted_sum_count
    from iceberg_ingestion_spark.queries_ext import read_events_us
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-skew")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = read_events_us(spark, sf)

    def set_conf(broadcast: bool, skew: bool) -> None:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", "10485760" if broadcast else "-1"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew).lower())

    for mult in mults:
        ev = base if mult == 1 else blow_up(base, ["event_id", "user_id"], mult)
        # deterministic 1000x-hot re-key: ~half the rows land on key 0, the
        # other half spread over 1000 cold keys
        fact = ev.withColumn(
            "k",
            F.when(F.pmod(F.xxhash64("event_id"), F.lit(2)) == 0, F.lit(0)).otherwise(
                F.lit(1) + F.pmod(F.xxhash64("event_id", "user_id"), F.lit(1000))
            ),
        ).select("k", "event_id", "value").cache()
        n = fact.count()
        dim = (
            spark.range(0, 1001)
            .select(F.col("id").alias("k"), (F.col("id") * 7).alias("dim_payload"))
            .cache()
        )
        dim.count()
        hot_n = fact.filter("k = 0").count()
        print(
            f"\n== SKEW {mult}x: {n} rows, hot key 0 = {hot_n} rows "
            f"(~{hot_n * 1000 // max(n - hot_n, 1)}x a cold key) ==",
            flush=True,
        )

        set_conf(broadcast=True, skew=True)
        bench_cancelable(spark, f"join_broadcast   {mult}x",
                         lambda: fact.join(dim, "k"))
        set_conf(broadcast=False, skew=True)
        bench_cancelable(spark, f"join_smj_aqe     {mult}x",
                         lambda: fact.join(dim, "k"))
        set_conf(broadcast=False, skew=False)
        bench_cancelable(spark, f"join_smj_noskew  {mult}x",
                         lambda: fact.join(dim, "k"))
        bench_cancelable(
            spark, f"join_salted      {mult}x",
            lambda: salted_join_hot_keys(fact, dim, "k", hot_keys=[0], n_salts=32),
        )
        set_conf(broadcast=True, skew=True)
        aggs = {
            "n": F.count(F.lit(1)),
            "sum_value": F.sum(F.col("value").cast("decimal(18,2)")),
        }
        bench_cancelable(
            spark, f"agg_plain        {mult}x",
            lambda: fact.groupBy("k").agg(*[e.alias(c) for c, e in aggs.items()]),
        )
        bench_cancelable(
            spark, f"agg_salted       {mult}x",
            lambda: salted_sum_count(fact, ["k"], aggs, n_salts=32),
        )
        fact.unpersist()
        dim.unpersist()
    spark.stop()
    return 0


def late_curve(mults: list[int]) -> int:
    """Scale curves for the round-4 late block: SCD2 build, HLL sliding
    windows, edit-distance verify.

    Expected shapes: scd2 is one keyed window over a 2-versions-per-key
    history — linear with a single hash shuffle; hll_sliding moves
    n_days x window sketch rows regardless of event volume — the curve
    tracks the raw scan, not the distinct-pair set; edit-distance runs on a
    FRESH-content corpus (identical-copy blowup would make the true pair
    set itself quadratic by construction, as in the minhash note above) —
    candidates stay sparse, so the curve tracks candidate volume, and the
    wall-clock cap makes unbounded growth print as the finding.
    """
    from iceberg_ingestion_spark.changes import scd2_from_history
    from iceberg_ingestion_spark.operators import dedup, text
    from iceberg_ingestion_spark.operators.sketches import hll_sliding_distinct
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-late")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base_orders = spark.read.parquet(f"{sf}/orders.parquet").repartition(32)
    base_events = spark.read.parquet(f"{sf}/events.parquet").repartition(32)
    base_docs = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)

    for mult in mults:
        orders = (base_orders if mult == 1 else blow_up(base_orders, ["o_orderkey"], mult)).cache()
        events = (
            (base_events if mult == 1 else blow_up(base_events, ["event_id", "user_id"], mult))
            .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
            .cache()
        )
        docs = (base_docs if mult == 1 else fresh_blow_up(base_docs, mult)).cache()
        print(f"\n== late {mult}x: {orders.count()} orders, {events.count()} events, "
              f"{docs.count()} docs ==", flush=True)

        hist = orders.unionByName(
            orders.withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
        )
        bench_cancelable(
            spark, f"scd2 (2 versions/key) {mult}x",
            lambda: scd2_from_history(hist, ["o_orderkey"], "o_orderdate"),
        )
        ev = events.select(F.expr("ts_us div 86400000000").alias("bucket"), "user_id")
        bench_cancelable(
            spark, f"hll_sliding_7d {mult}x",
            lambda: hll_sliding_distinct(ev, "bucket", "user_id", 7),
        )
        bench_cancelable(
            spark, f"edit_distance (fresh corpus) {mult}x",
            lambda: dedup.edit_distance_pairs(
                dedup.simhash_pairs(text.simhash60(docs, "doc_id"), "doc_id", max_hamming=2),
                docs, "doc_id",
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
            ),
        )
        orders.unpersist(); events.unpersist(); docs.unpersist()
    spark.stop()
    return 0


def prefix_ab(mults: list[int]) -> int:
    """Prefix-filter vs inverted-index A/B on the boilerplate-hazard corpus
    (fresh growth + a 10%-of-corpus boilerplate head — the caps_ab headline
    scenario). The claim under test: the prefix join needs NO cap because
    boilerplate shingles (highest df) sort last in the rarest-first canonical
    order and never enter its candidate join, so its curve should track the
    FRACTIONALLY-CAPPED index, not the quadratic uncapped one."""
    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-prefix")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)

    for mult in mults:
        docs = with_boilerplate(
            base if mult == 1 else fresh_blow_up(base, mult)
        ).cache()
        n = docs.count()
        print(f"\n== prefix A/B {mult}x: {n} docs (flat body df, 10% boilerplate head) ==")
        bench_cancelable(
            spark, f"prefix filter (no cap) {mult}x",
            lambda: dedup.jaccard_prefix_pairs(docs, "doc_id", threshold=0.5),
        )
        bench_cancelable(
            spark, f"index cap=2%PROP       {mult}x",
            lambda: dedup.ngram_jaccard_pairs(
                docs, "doc_id", threshold=0.5, max_shingle_df_frac=0.02,
            ),
        )
        if mult <= 5:
            bench_cancelable(
                spark, f"index UNCAPPED         {mult}x",
                lambda: dedup.ngram_jaccard_pairs(docs, "doc_id", threshold=0.5),
            )
        docs.unpersist()
    spark.stop()
    return 0


def cont_tfidf_ab(mults: list[int]) -> int:
    """Round-5 operators on the boilerplate-hazard corpus (fresh growth +
    a 10%-of-corpus boilerplate head). Two claims under test:

    - containment_prefix_pairs needs no cap for the same reason
      jaccard_prefix_pairs doesn't: boilerplate shingles (highest df) sort
      last in the rarest-first canonical order, so they never enter a
      PREFIX — and the containment join only probes FROM prefixes, so the
      full-index side's boilerplate rows never match anything.
    - tfidf_cosine_pairs is protected by ``max_df_frac`` ONLY if the cap
      sits below the boilerplate's df fraction: at the operator default
      (0.3, above the 10% head) the inverted-index join inherits the
      quadratic hazard — the LOW weight of high-df terms prunes pairs
      after the join, not the join itself — while a 0.05 cap drops the
      head structurally and the curve goes flat.
    """
    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-cont-tfidf")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)

    for mult in mults:
        docs = with_boilerplate(
            base if mult == 1 else fresh_blow_up(base, mult)
        ).cache()
        n = docs.count()
        print(f"\n== cont/tfidf A/B {mult}x: {n} docs (flat body df, 10% boilerplate head) ==")
        bench_cancelable(
            spark, f"containment prefix     {mult}x",
            lambda: dedup.containment_prefix_pairs(docs, "doc_id", threshold=0.8),
        )
        bench_cancelable(
            spark, f"tfidf max_df=5%        {mult}x",
            lambda: dedup.tfidf_cosine_pairs(
                docs, "doc_id", k=3, threshold=0.5, max_df_frac=0.05,
            ),
        )
        if mult <= 5:
            bench_cancelable(
                spark, f"tfidf max_df=30%(dflt) {mult}x",
                lambda: dedup.tfidf_cosine_pairs(
                    docs, "doc_id", k=3, threshold=0.5, max_df_frac=0.3,
                ),
            )
        docs.unpersist()
    spark.stop()
    return 0


def tfidf_prefix_ab(mults: list[int]) -> int:
    """Round-6 A/B (VERDICT r5 #1): Bayardo weighted-prefix candidate
    pruning vs the r5 full-index dot join, on the boilerplate-hazard corpus
    at the operator DEFAULT max_df (0.3 — above the 10% boilerplate head,
    so max_df does NOT protect either form; the threshold must). Reports,
    per multiplier:

    - full-index join rows  = Σ_t C(df_t, 2) over all retained terms (the
      r5 form's term-keyed join volume — every co-occurrence computes a
      partial dot whether or not the pair can reach t);
    - prefix join rows      = Σ_t C(pdf_t, 2) over PREFIX terms only (the
      threshold-driven bound — boilerplate terms sort last in the
      rarest-first order and their low weight keeps them out of prefixes);
    - surviving candidates  = pairs left after the positional prune (what
      the exact map-join verify actually pays for);
    - wall-clock of both forms (the r5 form is reconstructed inline below
      as a measurement baseline — it no longer exists in the operator).
    """
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.session import build_session

    def fulljoin_baseline(w, norms, id_col, threshold):
        # the r5 implementation: dot products directly in the term-keyed
        # self-join (no prefix, no positional prune) — kept ONLY as the A/B
        # measurement baseline
        a, b = w.alias("a"), w.alias("b")
        dots = (
            a.join(
                b,
                on=(F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(F.col(f"a.{id_col}").alias("id_1"), F.col(f"b.{id_col}").alias("id_2"))
            .agg(F.sum(F.col("a._wt") * F.col("b._wt")).alias("_dot"))
        )
        na = norms.select(F.col(id_col).alias("id_1"), F.col("_n2").alias("_n2a"))
        nb = norms.select(F.col(id_col).alias("id_2"), F.col("_n2").alias("_n2b"))
        return (
            dots.join(na, "id_1").join(nb, "id_2")
            .withColumn("cosine", F.expr("_dot / sqrt(CAST(_n2a AS DOUBLE) * CAST(_n2b AS DOUBLE))"))
            .filter(F.col("cosine") >= threshold)
            .select("id_1", "id_2", "cosine")
        )

    def join_rows(rel):
        return (
            rel.groupBy("shingle").agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.expr("c * (c - 1) DIV 2")).alias("r"))
            .collect()[0]["r"] or 0
        )

    def norms_of(w):
        # per-doc Σwt² for the r5 baseline (the operator now derives norms
        # inside the fused suffix-norm window — r7; this reconstructs the
        # r5 shape for measurement only)
        sq = F.col("_wt").cast("decimal(19,0)") * F.col("_wt").cast("decimal(19,0)")
        return w.groupBy("doc_id").agg(
            F.sum(sq).cast("long").alias("_n2")
        )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-tfidf-prefix")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)
    t = 0.5

    for mult in mults:
        docs = with_boilerplate(
            base if mult == 1 else fresh_blow_up(base, mult)
        ).cache()
        n = docs.count()
        print(f"\n== tfidf prefix A/B {mult}x: {n} docs (max_df=0.3 default, 10% boilerplate head) ==")
        w = dedup._tfidf_weights(docs, "doc_id", "text", 3, 0.3, 10_000)
        prefix = dedup._tfidf_prefix(dedup._tfidf_suffix_norms(w, "doc_id"), "doc_id", t)
        full_rows = join_rows(w)
        pref_rows = join_rows(prefix)
        a, b = prefix.alias("a"), prefix.alias("b")
        cand = (
            a.join(b, on=(F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("id_1"), F.col("b.doc_id").alias("id_2"))
            .agg(F.max("a._sfxd").alias("_sa"), F.max("b._sfxd").alias("_sb"),
                 F.first("a._n2").alias("_pn2a"), F.first("b._n2").alias("_pn2b"))
            .filter(F.col("_sa").cast("double") * F.col("_sb").cast("double")
                    >= F.col("_pn2a").cast("double") * F.col("_pn2b").cast("double")
                    * F.lit(t * t) * F.lit(1.0 - 1e-9))
        ).count()
        print(f"  join rows: full-index {full_rows:>12,}  prefix {pref_rows:>12,}  "
              f"({full_rows / max(pref_rows, 1):.1f}x less)  surviving candidates {cand:,}")
        bench_cancelable(
            spark, f"tfidf prefix (r6)      {mult}x",
            lambda: dedup.tfidf_cosine_pairs(docs, "doc_id", k=3, threshold=t, max_df_frac=0.3),
        )
        bench_cancelable(
            spark, f"tfidf full join (r5)   {mult}x",
            lambda: fulljoin_baseline(
                dedup._tfidf_weights(docs, "doc_id", "text", 3, 0.3, 10_000),
                norms_of(dedup._tfidf_weights(docs, "doc_id", "text", 3, 0.3, 10_000)),
                "doc_id", t),
        )
        w.unpersist()
        docs.unpersist()
    spark.stop()
    return 0


def bm25_multi_ab(mults: list[int]) -> int:
    """Batched BM25 retrieval curve (VERDICT r5 #3 done-criterion): the
    query-relation pipeline at growing corpus size. Expectation: near-linear
    — per-doc wordcount scales with the corpus, the scored relation scales
    with docs-containing-query-terms, and the top-k is two-phase (never
    serializes on #queries)."""
    from pyspark.sql import functions as F  # noqa: F401

    from iceberg_ingestion_spark.operators import similarity
    from iceberg_ingestion_spark.queries_text_dedup import (
        BM25_MULTI_K,
        BM25_MULTI_QUERIES,
    )
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-bm25-multi")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)
    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in BM25_MULTI_QUERIES.items() for t in ts],
        "query_id string, term string",
    )

    for mult in mults:
        docs = (base if mult == 1 else fresh_blow_up(base, mult)).cache()
        n = docs.count()
        print(f"\n== bm25 multi-query {mult}x: {n} docs, "
              f"{len(BM25_MULTI_QUERIES)} queries ==")
        bench_cancelable(
            spark, f"bm25_topk_batch        {mult}x",
            lambda: similarity.bm25_topk_batch(docs, qterms, k=BM25_MULTI_K),
        )
        docs.unpersist()
    spark.stop()
    return 0


def phash_ab(mults: list[int]) -> int:
    """Per-item vs distinct-signature (grouped) banding join A/B on the
    duplicate-heavy corpus — the perceptual-hash hazard: exact-duplicate
    payloads share ONE aHash, so a clique of B items collides in every band
    and the per-item join pays ~B^2 x (bands) candidate rows; the grouped
    join pays ONE row per distinct hash. Cluster SIZE scales with the
    multiplier (the hazard dimension); the fresh body stays fixed so curve
    growth isolates the clique term. 'grouped star' additionally removes the
    output-bound within-clique pair expansion (spanning star, same connected
    components — pytest-pinned)."""
    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.operators.multimodal import (
        ahash64,
        attach_binary_payload,
    )
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-phash")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)

    for mult in mults:
        docs = with_hot_clusters(base, spark, n_clusters=100, size=32 * mult).cache()
        n = docs.count()
        sigs = (
            ahash64(attach_binary_payload(docs), "doc_id")
            .withColumnRenamed("phash", "simhash")
            .cache()
        )
        sigs.count()  # hash pass outside the timer: the A/B is the JOIN
        print(
            f"\n== phash A/B {mult}x: {n} docs "
            f"(100 identical-payload cliques of {32 * mult}) ==",
            flush=True,
        )
        bench_cancelable(
            spark, f"per-item banding       {mult}x",
            lambda: dedup.simhash_pairs(sigs, "doc_id", max_hamming=10, bits=64),
        )
        bench_cancelable(
            spark, f"grouped (pairs)        {mult}x",
            lambda: dedup.simhash_pairs_grouped(
                sigs, "doc_id", max_hamming=10, bits=64
            ),
        )
        bench_cancelable(
            spark, f"grouped (star)         {mult}x",
            lambda: dedup.simhash_pairs_grouped(
                sigs, "doc_id", max_hamming=10, bits=64, equal_expansion="star"
            ),
        )
        sigs.unpersist()
        docs.unpersist()
    spark.stop()
    return 0


def incr_cont_ab(mults: list[int]) -> int:
    """Incremental CONTAINMENT curve (VERDICT r5 #6 done-criterion): a FIXED
    increment probed against a prefix index of an old corpus that grows with
    the multiplier. Claims: (a) the per-increment probe is near-flat in
    old-corpus size once the index is built (the index build is paid once
    per corpus version); (b) the from-scratch batch op over old ∪ new grows
    with the corpus."""
    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-incr-cont")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)
    # fixed increment: half fresh ids + half exact copies (cross-side
    # containment pairs to find)
    inc = (
        base.filter(F.col("doc_id") % 20 == 0)
        .withColumn("doc_id", F.col("doc_id") + 900_000_000)
        .unionByName(
            base.filter(F.col("doc_id") % 20 == 1).withColumn(
                "doc_id", F.col("doc_id") + 910_000_000
            )
        )
        .cache()
    )
    n_inc = inc.count()

    for mult in mults:
        old = (base if mult == 1 else fresh_blow_up(base, mult)).cache()
        n_old = old.count()
        print(f"\n== incr-cont {mult}x: old={n_old} docs, increment={n_inc} ==",
              flush=True)
        t0 = time.time()
        index = dedup.containment_prefix_index(old, "doc_id", k=3).cache()
        index.count()
        print(f"index build (once per corpus version)        {time.time()-t0:7.1f}s",
              flush=True)
        bench_cancelable(
            spark, f"incremental containment (index) {mult}x",
            lambda: dedup.containment_prefix_pairs_incremental(
                index, inc, "doc_id", k=3, threshold=0.8
            ),
        )
        bench_cancelable(
            spark, f"batch containment old ∪ new     {mult}x",
            lambda: dedup.containment_prefix_pairs(
                old.unionByName(inc), "doc_id", k=3, threshold=0.8
            ),
        )
        index.unpersist()
        old.unpersist()
    spark.stop()
    return 0


def incr_ab(mults: list[int]) -> int:
    """Incremental-dedup A/B: a FIXED daily increment deduped against an old
    corpus that grows with the multiplier. The claim under test: with the
    old corpus's minhash_index precomputed (the production shape — persisted
    once per corpus version), the increment's wall time is INDEPENDENT of
    old-corpus size, while the from-scratch full-union dedup grows with it.
    The index build itself is timed separately (paid once per version, not
    per increment)."""
    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-incr")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)
    # fixed increment: 10% of base, half fresh ids + half exact copies of
    # old docs (cross-side duplicates to find)
    inc = (
        base.filter(F.col("doc_id") % 20 == 0)
        .withColumn("doc_id", F.col("doc_id") + 900_000_000)
        .unionByName(
            base.filter(F.col("doc_id") % 20 == 1).withColumn(
                "doc_id", F.col("doc_id") + 910_000_000
            )
        )
        .cache()
    )
    n_inc = inc.count()

    for mult in mults:
        old = (base if mult == 1 else fresh_blow_up(base, mult)).cache()
        n_old = old.count()
        print(f"\n== incr A/B {mult}x: old={n_old} docs, increment={n_inc} ==", flush=True)
        t0 = time.time()
        sets_, entries = dedup.minhash_index(old, "doc_id")
        sets_ = sets_.cache()
        entries = entries.cache()
        sets_.count(), entries.count()
        print(f"index build (once per corpus version)        {time.time()-t0:7.1f}s",
              flush=True)
        bench_cancelable(
            spark, f"incremental (prebuilt index) {mult}x",
            lambda: dedup.minhash_lsh_pairs_incremental(
                None, inc, "doc_id", threshold=0.8, old_index=(sets_, entries)
            ),
        )
        bench_cancelable(
            spark, f"full union from scratch      {mult}x",
            lambda: dedup.minhash_lsh_pairs(
                old.unionByName(inc), "doc_id", threshold=0.8
            ),
        )
        sets_.unpersist(); entries.unpersist(); old.unpersist()
    spark.stop()
    return 0


def incr_tfidf_ab(mults: list[int]) -> int:
    """Incremental TF-IDF COSINE curve (VERDICT r6 #3 done-criterion): a
    FIXED increment probed against a weighted prefix index of an old corpus
    that grows with the multiplier. Claims: (a) the per-increment probe is
    near-flat in old-corpus size once the index + df relation are built
    (paid once per corpus version — the probe gets ``dfreq`` passed, the
    production shape); (b) the from-scratch batch op over old ∪ new grows
    with the corpus."""
    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-incr-tfidf")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)
    # fixed increment: half fresh ids + half exact copies (cross-side
    # weighted near-dup pairs to find)
    inc = (
        base.filter(F.col("doc_id") % 20 == 0)
        .withColumn("doc_id", F.col("doc_id") + 900_000_000)
        .unionByName(
            base.filter(F.col("doc_id") % 20 == 1).withColumn(
                "doc_id", F.col("doc_id") + 910_000_000
            )
        )
        .cache()
    )
    n_inc = inc.count()

    for mult in mults:
        old = (base if mult == 1 else fresh_blow_up(base, mult)).cache()
        n_old = old.count()
        print(f"\n== incr-tfidf {mult}x: old={n_old} docs, increment={n_inc} ==",
              flush=True)
        t0 = time.time()
        index = dedup.tfidf_prefix_index(old, "doc_id", k=3).cache()
        index.count()
        dfreq = dedup.tfidf_df_relation(index).cache()
        dfreq.count()
        print(f"index + df relation (once per corpus version) {time.time()-t0:7.1f}s",
              flush=True)
        bench_cancelable(
            spark, f"incremental tfidf (index+dfreq) {mult}x",
            lambda: dedup.tfidf_cosine_pairs_incremental(
                index, inc, "doc_id", k=3, threshold=0.5, dfreq=dfreq
            ),
        )
        bench_cancelable(
            spark, f"batch tfidf old ∪ new           {mult}x",
            lambda: dedup.tfidf_cosine_pairs(
                old.unionByName(inc), "doc_id", k=3, threshold=0.5
            ),
        )
        dfreq.unpersist()
        index.unpersist()
        old.unpersist()
    spark.stop()
    return 0


def substr_ab(mults: list[int]) -> int:
    """Winnowing substring-span curve (VERDICT r6 #6 done-criterion): corpus
    grows fresh-content style (the way real corpora grow — every added doc
    is a unique token stream, so per-gram selected-fingerprint df stays
    flat and only the base corpus's true duplicate structure emits spans).
    Claim: near-linear — the two window passes and the selected-gram
    equi-join scale with rows, not rows²; the quadratic hazard (corpus-wide
    boilerplate grams) is the documented pre-scrub/raise-k case, same as
    the n-gram caps story."""
    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-substr")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)

    for mult in mults:
        docs = (base if mult == 1 else fresh_blow_up(base, mult)).cache()
        n = docs.count()
        print(f"\n== substr {mult}x: {n} docs ==", flush=True)
        bench_cancelable(
            spark, f"substring_span_pairs {mult}x",
            lambda: dedup.substring_span_pairs(docs, "doc_id", k=4, window=5),
        )
        docs.unpersist()
    spark.stop()
    return 0


def scrub_ab(mults: list[int]) -> int:
    """Substring-span SCRUB curve (VERDICT r7 #1 done-criterion): the
    keep-first rebuild over the detected spans, corpus growing fresh-content
    style. Claim: near-linear — detection is the substr curve, and the
    rebuild adds one tokenize pass over the corpus plus a ranges join whose
    build side only holds duplicated docs (flat here: the duplicate
    structure lives in the fixed base corpus)."""
    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-scrub")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)

    for mult in mults:
        docs = (base if mult == 1 else fresh_blow_up(base, mult)).cache()
        n = docs.count()
        print(f"\n== scrub {mult}x: {n} docs ==", flush=True)
        bench_cancelable(
            spark, f"substring_span_scrub {mult}x",
            lambda: dedup.substring_span_scrub(docs, "doc_id", k=4, window=5),
        )
        docs.unpersist()
    spark.stop()
    return 0


def decon_scrub_ab(mults: list[int]) -> int:
    """Span-level decon curve: the benchmark side is FIXED (eval suites
    don't grow with the corpus — the same premise as the whole-doc decon
    broadcast), so pool growth should be ~linear: one gram+selection pass
    over the pool, a selected-gram join whose right side is constant, and
    a rebuild pass over the pool."""
    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-decon-scrub")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)
    bench = base.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text").cache()
    n_bench = bench.count()

    for mult in mults:
        pool0 = (base if mult == 1 else fresh_blow_up(base, mult))
        pool = (
            pool0.filter(F.col("doc_id") % 97 != 0).select("doc_id", "text").cache()
        )
        n = pool.count()
        print(f"\n== decon-scrub {mult}x: pool={n} docs, bench={n_bench} ==",
              flush=True)
        bench_cancelable(
            spark, f"decon_span_scrub {mult}x",
            lambda: dedup.decon_span_scrub(pool, bench, "doc_id", k=4, window=5),
        )
        pool.unpersist()
    spark.stop()
    return 0


def self_spans_ab(mults: list[int]) -> int:
    """Within-doc self-span curve: the gram self-join is id-co-partitioned
    (cost = Σ per-doc collision work, independent of corpus size), so
    fresh-content growth should be strictly LINEAR — flatter than any
    cross-doc family. Every 7th doc gets a self-duplicated 8-token tail so
    spans exist at every scale."""
    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-selfspans")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base0 = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    base = base0.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat_ws(" ", F.col("text"), F.concat_ws(" ", F.slice(toks, 1, 8))),
        ).otherwise(F.col("text")).alias("text"),
    )

    for mult in mults:
        docs = (base if mult == 1 else fresh_blow_up(base, mult)).cache()
        n = docs.count()
        print(f"\n== self-spans {mult}x: {n} docs ==", flush=True)
        bench_cancelable(
            spark, f"substring_self_spans {mult}x",
            lambda: dedup.substring_self_spans(docs, "doc_id", k=4, window=5),
        )
        docs.unpersist()
    spark.stop()
    return 0


def incr_substr_ab(mults: list[int]) -> int:
    """Incremental substring-span curve: a FIXED increment probed against a
    positional-gram + winnowing-selection index of an old corpus that grows
    with the multiplier. Claims: (a) the per-increment probe is near-flat
    once the index is built (selection is per-doc, old x old never joins);
    (b) the from-scratch batch op over old ∪ new grows with the corpus."""
    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.session import build_session

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="scale-smoke-incr-substr")
    spark.range(10_000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    base = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)
    inc = (
        base.filter(F.col("doc_id") % 20 == 0)
        .withColumn("doc_id", F.col("doc_id") + 900_000_000)
        .unionByName(
            base.filter(F.col("doc_id") % 20 == 1).withColumn(
                "doc_id", F.col("doc_id") + 910_000_000
            )
        )
        .cache()
    )
    n_inc = inc.count()

    for mult in mults:
        old = (base if mult == 1 else fresh_blow_up(base, mult)).cache()
        n_old = old.count()
        print(f"\n== incr-substr {mult}x: old={n_old} docs, increment={n_inc} ==",
              flush=True)
        t0 = time.time()
        index = dedup.substring_span_index(old, "doc_id", k=4, window=5).cache()
        index.count()
        print(f"index build (once per corpus version)        {time.time()-t0:7.1f}s",
              flush=True)
        bench_cancelable(
            spark, f"incremental substring (index) {mult}x",
            lambda: dedup.substring_span_pairs_incremental(
                index, inc, "doc_id", k=4, window=5
            ),
        )
        bench_cancelable(
            spark, f"batch substring old ∪ new     {mult}x",
            lambda: dedup.substring_span_pairs(
                old.unionByName(inc), "doc_id", k=4, window=5
            ),
        )
        index.unpersist()
        old.unpersist()
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--caps-ab":
        return caps_ab([int(a) for a in sys.argv[2:]] or [5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--prefix-ab":
        return prefix_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--ann":
        return ann_curve([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        return skew_curve([int(a) for a in sys.argv[2:]] or [1, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--late":
        return late_curve([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--cont-tfidf":
        return cont_tfidf_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--bm25-multi":
        return bm25_multi_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--tfidf-ab":
        return tfidf_prefix_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--phash":
        return phash_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--incr-cont":
        return incr_cont_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--incr-tfidf":
        return incr_tfidf_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--substr":
        return substr_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--scrub":
        return scrub_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--self-spans":
        return self_spans_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--decon-scrub":
        return decon_scrub_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--incr-substr":
        return incr_substr_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
    if len(sys.argv) > 1 and sys.argv[1] == "--incr":
        return incr_ab([int(a) for a in sys.argv[2:]] or [1, 5, 20])
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
    # Decontamination: benchmark side is FIXED-size (an eval suite doesn't
    # grow with the corpus), so the curve should be ~linear in corpus size —
    # broadcast join, no corpus-side shuffle of n-grams.
    from iceberg_ingestion_spark.operators import corpus as corpus_ops

    bench_df = spark.read.parquet(f"{sf}/documents.parquet").filter(
        F.col("doc_id") % 97 == 0
    )
    bench(
        "decontaminate (fixed benchmark)",
        corpus_ops.contamination_counts(docs, bench_df, n=4),
    )
    bench(
        "chunk_duplicate_counts",
        corpus_ops.chunk_duplicate_counts(docs, chunk_words=10),
    )
    # Bloom-prefilter variant of the same check: expected ~linear too —
    # the filter build is benchmark-sized, the probe side is k broadcast
    # semi-joins evaluated map-side, and only survivors shuffle.
    from iceberg_ingestion_spark.operators import bloom as bloom_ops

    bench(
        "decontaminate_bloom (fixed benchmark)",
        bloom_ops.contamination_counts_bloom(docs, bench_df, n=4),
    )
    # Corpus-trained bigram features: two corpus-sized shuffles + one join;
    # zipf head absorbed by map-side partial aggregation. ~linear.
    bench("bigram_corpus_features", text.bigram_corpus_features(docs))
    # Boilerplate scrub: chunk explode (|tokens|/4 rows) -> chunk-df groupBy
    # -> join -> per-doc rebuild. Three uniform-keyed shuffles, ~linear.
    bench(
        "boilerplate_chunk_scrub",
        corpus_ops.boilerplate_chunk_scrub(docs, chunk_words=4),
    )
    # Count-Min: shuffle volume is bounded by tasks x d x w regardless of
    # corpus size (map-side partial agg) -> should be flat-per-row linear scan.
    from iceberg_ingestion_spark.operators import sketches as sk_ops

    def cms_fn():
        cms = sk_ops.count_min_table(orders, "o_custkey")
        probes = orders.select("o_custkey").where(F.col("o_custkey") % 19 == 0).distinct()
        return sk_ops.count_min_estimate(cms, probes, "o_custkey")

    bench("count_min (build+probe)", cms_fn())
    # k-means assignment: broadcast codebook, map-side distance folds, one
    # uniform groupBy — linear in vectors, independent of k's shuffle cost.
    from iceberg_ingestion_spark.operators import clustering as cl_ops

    km_cents = cl_ops.hash_spread_centroids(vecs, "vec_id", "embedding", 8)
    bench(
        "kmeans_assign (k=8)",
        cl_ops.assign_nearest(vecs, km_cents, "vec_id", "embedding", 64),
    )
    # Time-series paths on a user-blown-up event stream (users scale with
    # mult, per-user span fixed at 30 days): resample explodes Σ span/bucket
    # rows — linear in users; anomaly is two keyed aggregations.
    from iceberg_ingestion_spark.operators import timeseries as ts_ops

    events = blow_up(
        spark.read.parquet(f"{sf}/events.parquet").repartition(32),
        ["event_id", "user_id"],
        mult,
    ).withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp"))).cache()
    print(f"events: {events.count()} rows")
    bench(
        "resample_locf (daily)",
        ts_ops.resample_locf(events, ["user_id"], "ts_us", "value",
                             ts_ops.DAY_US, ["event_id"]),
    )
    bench(
        "anomaly_flags (daily)",
        ts_ops.count_anomaly_flags(events, ["user_id"], "ts_us", ts_ops.DAY_US),
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
