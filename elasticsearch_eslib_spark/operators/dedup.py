"""Deduplication operators over the `documents` table — the training-data
pipeline suite (exact, MinHash+LSH, SimHash, n-gram Jaccard).

The reference has no dedup (it shipped raw docs to Elasticsearch); these
are the operators a 100 TB web-corpus pipeline needs in-engine. All are
expressed as DataFrame plans; every hash is the cross-engine md5_long
(functions/hashing.py) so the DuckDB oracle can value-check signatures,
not just row counts.

Scale notes:
  * exact dedup — one hash-shuffle on a 60-bit content hash; at 10^12 docs
    the groupBy key is uniform (no skew), and the map-side partial agg
    collapses singletons before the shuffle.
  * minhash — signatures are per-doc aggregations (shuffle by doc_id only);
    LSH banding turns all-pairs O(n²) into a groupBy on (band, band_hash)
    buckets (size-capped); verification packs each candidate doc's shingles
    into one array row — cost O(#candidates · doc_size), never a shingle
    self-join.
  * simhash — 64-bit, computed as 64 conditional sums in one groupBy (no
    row explosion); near-dup pairs via the pigeonhole band trick (4 × 16-bit
    bands find every hamming ≤ 3 pair exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from elasticsearch_eslib_spark.functions.hashing import md5_long, md5_long_seeded
from elasticsearch_eslib_spark.operators.fulltext import (
    load_documents, tokenize_tf,
)

N_MINHASH = 8          # minhash permutations (seeded md5 variants)
LSH_BANDS = 4          # 4 bands × 2 rows
LSH_ROWS = 2
SHINGLE_K = 3          # 3-gram word shingles
SIMHASH_BITS = 64      # two 32-bit halves (simhash_hi / simhash_lo) — both
                       # BIGINT-safe in Spark and DuckDB (no 1<<63 overflow)
SIMHASH_SEED_LO = 101  # seeded md5 supplying bits 0..31
SIMHASH_SEED_HI = 202  # seeded md5 supplying bits 32..63
HAMMING_RADIUS = 3     # simhash_pairs: exact near-dup pairs at hamming ≤ 3
MAX_LSH_BUCKET = 1000  # LSH buckets larger than this are skipped: a band
                       # shared by >1000 docs is boilerplate/exact-dup-class
                       # content (exact dedup's job); the cap bounds pair
                       # generation at O(buckets · cap²) instead of O(n²)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: (text_hash, keep_doc_id, n_copies); keeper = min doc_id."""
    docs = load_documents(spark, sf_dir)
    return (docs.select("doc_id", md5_long(F.col("text")).alias("text_hash"))
            .groupBy("text_hash")
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n_copies")))


def spread(df: DataFrame, by: str = "doc_id") -> DataFrame:
    """Repartition up ONLY when the input SCAN is under-parallel (a small
    local file → 1 task would serialize the CPU-heavy map work that
    follows). On a real many-file corpus the scan already has enough
    partitions and this is a no-op — no unconditional shuffle at scale.

    Call this on RAW SCANS only: `.rdd.getNumPartitions()` on a joined /
    aggregated plan triggers eager AQE stage execution (measured: it
    silently doubled the whole candidate pipeline's cost)."""
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < n_part:
        return df.repartition(n_part, by)
    return df


def shingles_of(docs: DataFrame, do_spread: bool = True) -> DataFrame:
    """(doc_id, shingle): distinct k-word shingles of a documents-shaped df.

    The token array is materialized as a column BEFORE the transform —
    inlining it would re-evaluate filter(split(text)) inside every
    element_at, turning shingling O(len²) per doc (measured 16s → 3s on
    5000 docs)."""
    if do_spread:
        docs = spread(docs)
    toks_col = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    base = (docs.select("doc_id", toks_col.alias("toks"))
            .where(F.size("toks") >= SHINGLE_K))
    t = F.col("toks")
    sh = F.transform(
        F.sequence(F.lit(1), F.size(t) - (SHINGLE_K - 1)),
        lambda i: F.concat_ws(" ", F.element_at(t, i),
                              F.element_at(t, i + 1),
                              F.element_at(t, i + 2)))
    return base.select("doc_id", F.explode(sh).alias("shingle")).distinct()


def shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shingles_of(load_documents(spark, sf_dir))


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig_0..sig_7): min over shingles of seeded md5_long."""
    sh = shingles(spark, sf_dir)
    aggs = [F.min(md5_long_seeded(F.col("shingle"), j)).alias(f"sig_{j}")
            for j in range(N_MINHASH)]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame,
                        max_bucket: int = MAX_LSH_BUCKET) -> DataFrame:
    """(doc_a, doc_b) distinct LSH candidates from a minhash signature df.

    Banding: N_MINHASH sigs → LSH_BANDS bands of LSH_ROWS; docs sharing any
    band bucket become candidates (grouped join — never all-pairs). Buckets
    with more than `max_bucket` members are dropped BEFORE pairing: a band
    value shared by that many docs means exact-dup-class boilerplate
    (dedup_exact's job) and would otherwise cost cap-free O(m²) pairs.
    """
    # one pass: explode (band, bucket) structs instead of a 4-way union
    # (a union would recompute the signature aggregation per branch)
    band_structs = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[F.col(f"sig_{b * LSH_ROWS + r}")
                              for r in range(LSH_ROWS)]).alias("bucket"))
        for b in range(LSH_BANDS)])
    banded = (sigs.select("doc_id", F.explode(band_structs).alias("bb"))
              .select("doc_id", F.col("bb.band").alias("band"),
                      F.col("bb.bucket").alias("bucket")))
    wcnt = Window.partitionBy("band", "bucket")
    banded = (banded.withColumn("__n", F.count("*").over(wcnt))
              .where(F.col("__n") <= max_bucket).drop("__n"))
    return (banded.alias("a").join(banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str,
                      jaccard_threshold: float = 0.5) -> DataFrame:
    """LSH candidate pairs verified by exact shingle Jaccard.

    (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard ≥ threshold.

    Verification never self-joins the shingle table: the candidate doc set
    (LSH-bounded, ≪ corpus) is semi-joined down first, each candidate doc's
    distinct shingles are packed into ONE array row, and the exact
    intersection is a JVM-side array_intersect per candidate pair. Cost is
    O(#candidates · doc_size) — a boilerplate shingle shared by m docs can
    no longer produce m² intermediate rows (it inflates nothing here; it
    only ever lives inside per-doc arrays).
    """
    sigs = minhash_signatures(spark, sf_dir)
    # the candidate table is small (LSH-bounded) but its lineage holds the
    # full shingle+signature pipeline; it is consumed TWICE below (pair join
    # + candidate-doc semi-join) — persist so the corpus is signed once
    cand = lsh_candidate_pairs(sigs).persist()
    cand_docs = (cand.select(F.col("doc_a").alias("doc_id"))
                 .union(cand.select(F.col("doc_b").alias("doc_id")))
                 .distinct())
    # semi-join BEFORE shingling: only candidate docs (≪ corpus) are ever
    # re-shingled for verification — the full-corpus shingle pass happens
    # exactly once (inside the signature aggregation). spread() runs on the
    # raw scan (pre-join) — see its AQE warning.
    docs = (spread(load_documents(spark, sf_dir))
            .join(cand_docs, "doc_id", "left_semi"))
    packed = (shingles_of(docs, do_spread=False)
              .groupBy("doc_id")
              .agg(F.collect_list("shingle").alias("shs"),
                   F.count("*").alias("n_sh")))
    pa = packed.select(F.col("doc_id").alias("doc_a"),
                       F.col("shs").alias("shs_a"), F.col("n_sh").alias("n_a"))
    pb = packed.select(F.col("doc_id").alias("doc_b"),
                       F.col("shs").alias("shs_b"), F.col("n_sh").alias("n_b"))
    return (cand.join(pa, "doc_a").join(pb, "doc_b")
            .withColumn("n_inter",
                        F.size(F.array_intersect("shs_a", "shs_b")).cast("long"))
            .withColumn("jaccard", F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
            .where(F.col("jaccard") >= jaccard_threshold)
            .select("doc_a", "doc_b", "jaccard"))


def simhash_of(tf: DataFrame) -> DataFrame:
    """(doc_id, simhash_hi, simhash_lo): 64-bit tf-weighted simhash as two
    32-bit halves (bit j set iff the tf-weighted ±1 sum over term-hash bit
    j is > 0).

    No row explosion: the 64 per-bit sums are 64 conditional-sum aggregate
    expressions over the (doc_id, term, tf) rows — ONE groupBy shuffle of
    the tf stream (with map-side partial agg), versus the 16×-amplified
    explode layout this replaces. Two seeded md5 hashes supply 32
    independent bits each (md5_long is only 60 bits wide)."""
    h = (tf.withColumn("h0", md5_long_seeded(F.col("term"), SIMHASH_SEED_LO))
         .withColumn("h1", md5_long_seeded(F.col("term"), SIMHASH_SEED_HI)))
    aggs = []
    for j in range(32):
        aggs.append(F.sum(
            F.when(F.expr(f"shiftright(h0, {j}) & 1") == 1, F.col("tf"))
             .otherwise(-F.col("tf"))).alias(f"s_{j}"))
    for j in range(32):
        aggs.append(F.sum(
            F.when(F.expr(f"shiftright(h1, {j}) & 1") == 1, F.col("tf"))
             .otherwise(-F.col("tf"))).alias(f"s_{32 + j}"))
    sums = h.groupBy("doc_id").agg(*aggs)
    lo = F.lit(0).cast("long")
    hi = F.lit(0).cast("long")
    for j in range(32):
        lo = lo + F.when(F.col(f"s_{j}") > 0, F.lit(1 << j)).otherwise(0)
        hi = hi + F.when(F.col(f"s_{32 + j}") > 0, F.lit(1 << j)).otherwise(0)
    return sums.select("doc_id", hi.cast("long").alias("simhash_hi"),
                       lo.cast("long").alias("simhash_lo"))


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the 64 map-side partial sums are the CPU cost — they must not
    # serialize on a 1-task local scan (no-op on a many-file corpus)
    from elasticsearch_eslib_spark.operators.fulltext import tokenize_tf_of
    return simhash_of(tokenize_tf_of(spread(load_documents(spark, sf_dir))))


def simhash_pairs_of(sig: DataFrame,
                     radius: int = HAMMING_RADIUS) -> DataFrame:
    """(doc_a, doc_b, hamming ≤ radius) near-dup pairs — EXACT result via
    the pigeonhole band trick: split the 64-bit simhash into radius+1
    disjoint 16-bit bands; any pair at hamming ≤ radius must agree on at
    least one whole band (pigeonhole), so grouping by band value finds
    every such pair without an all-pairs join. Candidates are then filtered
    by the exact popcount hamming distance — deterministic, so this has a
    full SQL oracle (DuckDB brute-forces all pairs at test scale and must
    produce the identical set, proving the banding loses nothing)."""
    assert radius + 1 == 4, "banding below is laid out for 4 × 16-bit bands"
    # sig is consumed four times (two band sides + two signature lookups);
    # its lineage is the 64-agg pass over the whole corpus — persist it
    sig = sig.persist()
    bands = F.array(
        F.struct(F.lit(0).alias("band"),
                 F.expr("simhash_lo & 65535").alias("v")),
        F.struct(F.lit(1).alias("band"),
                 F.expr("shiftright(simhash_lo, 16) & 65535").alias("v")),
        F.struct(F.lit(2).alias("band"),
                 F.expr("simhash_hi & 65535").alias("v")),
        F.struct(F.lit(3).alias("band"),
                 F.expr("shiftright(simhash_hi, 16) & 65535").alias("v")))
    banded = (sig.select("doc_id", F.explode(bands).alias("bb"))
              .select("doc_id", F.col("bb.band").alias("band"),
                      F.col("bb.v").alias("v")))
    cand = (banded.alias("a").join(banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    sa = sig.select(F.col("doc_id").alias("doc_a"),
                    F.col("simhash_hi").alias("hi_a"),
                    F.col("simhash_lo").alias("lo_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"),
                    F.col("simhash_hi").alias("hi_b"),
                    F.col("simhash_lo").alias("lo_b"))
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("hamming",
                        (F.bit_count(F.expr("hi_a ^ hi_b"))
                         + F.bit_count(F.expr("lo_a ^ lo_b"))).cast("int"))
            .where(F.col("hamming") <= radius)
            .select("doc_a", "doc_b", "hamming"))


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs_of(simhash(spark, sf_dir))


def jaccard_vs_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard of every doc against the seed doc (min doc_id):
    (doc_id, jaccard) — the linear-cost brute-force baseline."""
    sh = shingles(spark, sf_dir)
    # the seed doc and its shingle set come from ONE document row — never
    # recompute the full corpus shingle explode for them
    docs = load_documents(spark, sf_dir)
    toks_sz = F.size(F.filter(F.split("text", " "), lambda x: x != F.lit("")))
    seed_id = (docs.where(toks_sz >= SHINGLE_K)
               .agg(F.min("doc_id")).collect()[0][0])
    seed_row = docs.where(F.col("doc_id") == seed_id)
    seed = (shingles_of(seed_row)
            .select(F.col("shingle").alias("s_shingle")))
    n_seed = seed.count()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (sh.join(F.broadcast(seed),
                     sh["shingle"] == seed["s_shingle"])
             .groupBy("doc_id").agg(F.count("*").alias("n_inter")))
    return (sizes.join(inter, "doc_id", "left")
            .na.fill({"n_inter": 0})
            .withColumn("jaccard", F.round(
                F.col("n_inter")
                / (F.col("n_sh") + F.lit(n_seed) - F.col("n_inter")), 6))
            .select("doc_id", "jaccard"))
