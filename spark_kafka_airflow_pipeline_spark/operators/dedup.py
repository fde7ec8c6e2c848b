"""Deduplication operators over the documents table [EXT]:

- **exact**: hash-groupBy on the raw text (and on the canonical
  fingerprint) — one shuffle on the dedup key, keep min doc_id.
- **MinHash + banding LSH**: shingle -> 16-hash MinHash signature ->
  band buckets -> self-join within buckets -> verify with true Jaccard.
  All JVM expressions (murmur3 ``F.hash``), deterministic seed, no
  pyspark.ml dependency, no Python in the hot path.
- **SimHash**: 64-bit signature over char n-grams; near-dup candidates
  = identical signature (Hamming-0 buckets; banded Hamming-k is the
  scale-out variant).
- **n-gram Jaccard**: direct pairwise verify used on LSH candidates.

Scale: the pairwise step only ever runs on LSH bucket candidates —
never a full cross join. Buckets are murmur3 of (band-slice), so skew =
duplicate-cluster size, bounded in practice; a salting pass would bound
it adversarially.

The exact variants are SQL-oracle-able; MinHash/SimHash use Spark's
murmur3/xxhash64 which DuckDB lacks, so those register rows-only checks
(driver records weaker coverage; SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.functions import text as T
from spark_kafka_airflow_pipeline_spark.operators.base import QueryFn, table


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on text: keep the lowest doc_id per distinct text.
    min-per-group instead of dropDuplicates so the survivor is
    deterministic (dropDuplicates keeps an arbitrary row)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"),
             F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup on the canonical fingerprint (lowercase,
    whitespace-normalized md5) — catches case/whitespace variants."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", T.fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


DEDUP_FINGERPRINT_SQL = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       min(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def minhash_signature_agg(d: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", num_hashes: int = 16,
                          k: int = 3, seed: int = 42) -> DataFrame:
    """Scalable MinHash: explode shingles to rows, compute the
    ``num_hashes`` family mins as whole-stage-codegen aggregates (one
    shuffle on the doc id). Uses one murmur3 per shingle + a universal
    multiply-add family (odd multipliers are bijections mod 2^64, so
    each family is a valid permutation-hash); deterministic, no
    interpreted higher-order functions in the hot path."""
    # single-file tables arrive as ONE input split; spread rows before
    # the compute-heavy explode+hash so all cores work (at 100 TB the
    # scan has thousands of splits and this repartition coalesces into
    # the shuffle that groupBy needs anyway)
    par = d.sparkSession.sparkContext.defaultParallelism
    sh = (d.repartition(par, id_col)
          .select(F.col(id_col),
                  F.explode(T.shingles(F.col(text_col), k)).alias("s")))
    # one murmur3 per shingle, then a universal-hash family over it:
    # h_i = a_i * h + b_i (64-bit wraparound) — 16 multiply-adds instead
    # of 16 murmur evaluations
    h = F.hash(F.lit(seed), F.col("s")).cast("long")
    mins = sh.select(id_col, h.alias("h")).groupBy(id_col).agg(*[
        F.min(F.col("h") * F.lit(2 * i + 1).cast("long")
              + F.lit(i * 0x9E3779B1).cast("long")).alias(f"m{i}")
        for i in range(num_hashes)
    ])
    return mins.select(
        id_col, F.array(*[f"m{i}" for i in range(num_hashes)]).alias("minhash"))


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str,
                      num_hashes: int = 16, bands: int = 4,
                      jaccard_threshold: float = 0.5) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, verified with true shingle
    Jaccard. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.

    Plan shape (scales to 100 TB):
      1. one pass: text -> shingles -> 16 minhashes    (no shuffle)
      2. explode to (band_bucket, doc)                 (narrow)
      3. self-join on band_bucket                      (shuffle on bucket)
      4. distinct candidate pairs, verify Jaccard      (shuffle on pair)
    The full cross join never happens; only same-bucket pairs are
    compared. Rows-only correctness check (murmur3 not in DuckDB).
    """
    rows_per_band = num_hashes // bands
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    # slim banded frame: (doc_id, band, bucket) only — the bucket
    # self-join must NOT shuffle the shingle arrays, and the minhash
    # signature comes from the codegen'd aggregate form (explode +
    # 16 min-aggs), not interpreted per-array higher-order functions
    banded = (
        minhash_signature_agg(d, num_hashes=num_hashes)
        .select("doc_id", F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.slice("minhash", b * rows_per_band + 1, rows_per_band))
                .alias("bucket"),
            )
            for b in range(bands)
        ])).alias("bb"))
        .select("doc_id", "bb.band", "bb.bucket")
    )
    # intra-bucket pairs WITHOUT a self-join: group docs per bucket and
    # explode the combinations — the signature pipeline runs exactly
    # once (a self-join would recompute it per side). Bucket skew ==
    # duplicate-cluster size; collect_list is safe because a bucket
    # holds near-identical docs, not arbitrary keys.
    pair_structs = F.filter(
        F.flatten(F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2,
                        F.greatest(F.size(F.col("docs")) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b"))),
        )),
        lambda p: p.isNotNull(),
    )
    cand = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # fetch shingles only for the (few) candidate pairs, then verify.
    # broadcast the TINY candidate list explicitly — letting the planner
    # broadcast the shingle side instead materializes thousands of
    # string arrays as JVM objects on every task thread (GC storm).
    par = d.sparkSession.sparkContext.defaultParallelism
    sh = d.repartition(par).select("doc_id", T.shingles("text", k=3).alias("sh"))
    return (
        F.broadcast(cand)
        .join(sh.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a"}), "doc_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b"}), "doc_b")
        .withColumn("jaccard", F.round(T.jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash64_agg(d: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", ngram: int = 3) -> DataFrame:
    """Scalable SimHash-64: explode char n-grams, hash each ONCE, then 64
    codegen'd conditional sums per doc (one shuffle on doc id).

    The pure-expression ``functions.text.simhash64`` is fine for small
    arrays but re-evaluates the gram-hash array per bit filter (64x) in
    interpreted higher-order functions; this aggregation form is the
    100 TB path: whole-stage-codegen sums over a (doc, gram_hash) stream.
    """
    par = d.sparkSession.sparkContext.defaultParallelism
    grams = d.repartition(par, id_col).select(
        F.col(id_col),
        F.explode(T.char_ngrams(F.col(text_col), ngram)).alias("g"),
    ).select(id_col, F.xxhash64("g").alias("h"))
    bit_counts = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)).cast("long"))
          .alias(f"c{b}") for b in range(64)],
    )
    sig = bit_counts.select(
        id_col,
        sum(
            (F.when(F.col(f"c{b}") * 2 >= F.col("n"),
                    F.shiftleft(F.lit(1).cast("long"), b))
             .otherwise(F.lit(0).cast("long")) for b in range(64)),
            start=F.lit(0).cast("long"),
        ).alias("sig"),
    )
    return sig


def simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 dedup: docs sharing an identical 64-bit signature are
    near-dup candidates. Returns signature groups with >1 member.
    Rows-only check (xxhash64 not in DuckDB)."""
    d = table(spark, sf_dir, "documents")
    return (
        simhash64_agg(d)
        .groupBy("sig")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.array_join(F.transform(F.sort_array(F.collect_list("doc_id")),
                                      lambda x: x.cast("string")), ",")
             .alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_dups(spark: SparkSession, sf_dir: str,
                       threshold: float = 0.9) -> DataFrame:
    """Character-3-gram Jaccard near-dups among same-fingerprint-prefix
    groups (cheap blocking key so this is never a cross join). Returns
    near-dup pairs; SQL-expressible blocking makes the *candidate
    generation* oracle-able, but the jaccard arithmetic over arrays is
    verified by the exact-dup subset, so this stays rows-only."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        T.char_ngrams("text", 3).alias("grams"),
        # blocking key: first 16 shingle-chars of canonical text
        F.substring(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), 1, 16)
        .alias("block"),
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .withColumn("jaccard",
                    F.round(T.jaccard(F.col("a.grams"), F.col("b.grams")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"), "jaccard")
    )


QUERIES: dict[str, QueryFn] = {
    "dedup_exact": dedup_exact,
    "dedup_fingerprint": dedup_fingerprint,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "simhash_buckets": simhash_buckets,
    "ngram_jaccard_dups": ngram_jaccard_dups,
}

# rows-only entries (minhash/simhash/ngram) intentionally absent here
ORACLES: dict[str, str] = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_fingerprint": DEDUP_FINGERPRINT_SQL,
}
