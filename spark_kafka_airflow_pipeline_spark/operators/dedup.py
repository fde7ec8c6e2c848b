"""Deduplication operators over the documents table [EXT]:

- **exact**: hash-groupBy on the raw text (and on the canonical
  fingerprint) — one shuffle on the dedup key, keep min doc_id.
- **MinHash + banding LSH**: shingle -> 16-hash MinHash signature ->
  band buckets -> self-join within buckets -> verify with true Jaccard.
  All JVM expressions (murmur3 ``F.hash``), deterministic seed, no
  pyspark.ml dependency, no Python in the hot path.
- **SimHash**: 64-bit signature over char n-grams; ``simhash_buckets``
  groups identical signatures (Hamming-0), ``simhash_near_dups`` bands
  the signature 4 x 16 bits for exact recall at Hamming <= 3.
- **n-gram Jaccard**: char-level MinHash band blocking + pairwise
  verify (prefix blocking was a skew bomb on natural-language text).

Scale: the pairwise step only ever runs on LSH bucket candidates —
never a full cross join. Buckets are murmur3 of (band-slice); bucket
clique expansion is capped at ``MAX_BUCKET_CLIQUE`` members with star
pairs for the overflow, so even an adversarial mega-cluster of
identical documents costs O(n) candidates. The verify join's broadcast
decision is AQE's, made from runtime sizes (see
``verify_pairs_jaccard``).

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
                          k: int = 3, seed: int = 42,
                          tokens=None,
                          with_feature_set: bool = False) -> DataFrame:
    """Scalable MinHash: explode shingles to rows, compute the
    ``num_hashes`` family mins as whole-stage-codegen aggregates (one
    shuffle on the doc id). Each family is an INDEPENDENT hash: one
    xxhash64 per shingle string, then murmur3(i, h64) per family —
    hashing the 8-byte long per family is far cheaper than re-hashing
    the string, and murmur3 with a distinct first argument is a
    distinct function.

    NB: the obvious "universal family" shortcut ``min(h * odd_i + c_i)``
    is WRONG here: without 64-bit wraparound (products of a 32-bit hash
    by small odd constants never overflow a long) the transform is
    MONOTONE, so every family selects the same argmin shingle and the
    whole signature degenerates to one effective hash function — at
    sf0.1 that admitted 60% of all doc pairs as LSH candidates
    (7.5M pairs from 5000 docs).

    ``tokens`` overrides the feature extractor: a function
    ``text_column -> array<string> Column`` (default: word ``k``-
    shingles; pass ``lambda c: T.char_ngrams(c, 3)`` for character-level
    MinHash).

    ``with_feature_set=True`` additionally aggregates the doc's
    DISTINCT feature hashes (``fset``: array<long>) in the SAME pass —
    the verify join then computes true Jaccard on these hash sets
    (identical to string-set Jaccard up to 64-bit collisions), so the
    whole dedup pipeline tokenizes the corpus exactly once."""
    tokens = tokens or (lambda c: T.shingles(c, k))
    # single-file tables arrive as ONE input split; spread rows before
    # the compute-heavy explode+hash so all cores work (at 100 TB the
    # scan has thousands of splits and this repartition coalesces into
    # the shuffle that groupBy needs anyway)
    par = d.sparkSession.sparkContext.defaultParallelism
    sh = (d.repartition(par, id_col)
          .select(F.col(id_col),
                  F.explode(tokens(F.col(text_col))).alias("s")))
    h = F.xxhash64(F.lit(seed), F.col("s"))
    extra = [F.collect_set("h").alias("fset")] if with_feature_set else []
    mins = sh.select(id_col, h.alias("h")).groupBy(id_col).agg(
        *[F.min(F.hash(F.lit(i), F.col("h"))).alias(f"m{i}")
          for i in range(num_hashes)],
        *extra,
    )
    out_cols = [id_col,
                F.array(*[f"m{i}" for i in range(num_hashes)]).alias("minhash")]
    if with_feature_set:
        out_cols.append(F.col("fset"))
    return mins.select(*out_cols)


# Bound on the all-pairs (clique) expansion within one LSH bucket.
# Above this size a bucket is a mega-cluster (boilerplate pages, empty
# docs): emitting its full clique is O(n^2) pairs for zero extra dedup
# information, so members beyond the cap are connected by STAR pairs to
# the bucket's minimum doc id instead — O(n) pairs that keep every
# member attached to the cluster's survivor for connected-component
# dedup (pinned by tests/test_dedup_similarity.py::test_mega_cluster_cap).
MAX_BUCKET_CLIQUE = 256


def lsh_band_candidates(signatures: DataFrame, num_hashes: int, bands: int,
                        id_col: str = "doc_id",
                        sig_col: str = "minhash",
                        max_bucket: int = MAX_BUCKET_CLIQUE) -> DataFrame:
    """Candidate near-dup pairs from banded LSH over an array-typed
    signature column: split the signature into ``bands`` slices, hash
    each slice to a bucket, emit within-bucket pairs.

    Plan shape (scales to 100 TB):
      1. explode to (band, bucket, doc)                (narrow)
      2. group docs per bucket, explode combinations   (one shuffle)
      3. distinct candidate pairs                      (shuffle on pair)
    Intra-bucket pairs come from collect_list + combinations, NOT a
    bucket self-join — the signature pipeline runs exactly once (a
    self-join would recompute it per side).

    Adversarial skew guard: a bucket's clique expansion is capped at
    ``max_bucket`` members (C(256,2) ~ 32k pairs); members beyond the
    cap each emit ONE star pair to the bucket's min doc id, so a
    100 TB corpus with a million identical boilerplate pages yields
    O(n) candidates for that cluster, not O(n^2), and every member
    still reaches the cluster survivor through the star center.
    """
    rows_per_band = num_hashes // bands
    banded = (
        signatures
        .select(id_col, F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.slice(sig_col, b * rows_per_band + 1, rows_per_band))
                .alias("bucket"),
            )
            for b in range(bands)
        ])).alias("bb"))
        .select(id_col, "bb.band", "bb.bucket")
    )
    capped = F.slice(F.col("docs"), 1, max_bucket)
    clique_pairs = F.flatten(F.transform(
        capped,
        lambda x, i: F.transform(
            F.slice(capped, i + 2,
                    F.greatest(F.size(capped) - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b"))),
    ))
    star_pairs = F.transform(
        F.slice(F.col("docs"), max_bucket + 1,
                F.greatest(F.size(F.col("docs")) - max_bucket, F.lit(0))),
        lambda y: F.struct(F.element_at(F.col("docs"), 1).alias("doc_a"),
                           y.alias("doc_b")),
    )
    pair_structs = F.filter(F.concat(clique_pairs, star_pairs),
                            lambda p: p.isNotNull())
    return (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("docs"))
        .filter(F.size("docs") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def verify_pairs_jaccard(cand: DataFrame, features: DataFrame,
                         jaccard_threshold: float) -> DataFrame:
    """Join candidate (doc_a, doc_b) pairs with their feature sets and
    keep pairs whose true Jaccard clears the threshold.

    Broadcast posture (r3): NO hint, NO driver-side count — AQE decides
    at runtime from the ACTUAL shuffle sizes. When the candidate set is
    small (the normal case) AQE converts the join to a broadcast of the
    candidate side; when a high-dup corpus produces a huge candidate
    set, its real size exceeds ``spark.sql.autoBroadcastJoinThreshold``
    and the join stays a shuffle join. This supersedes r2's counted
    ``MAX_BROADCAST_PAIRS`` guard, which needed either a persisted
    candidate frame (a CacheManager leak per call — the r2 ADVICE
    finding: the cache under a lazily-returned frame can never be
    unpersisted before the caller's action) or a second run of the
    candidate lineage to pay for the count (2x the signature pass —
    measured +1.1 s on minhash_lsh_pairs at sf0.1). AQE's size check is
    also strictly safer: it bounds broadcast BYTES, not a pair count
    proxy. The shuffle path is exercised in tests by disabling the
    broadcast threshold (tests/test_dedup_similarity.py).

    Join shape (r3): the pair list is MELTED to (pair, side, doc_id) so
    the feature table is probed ONCE — the naive cand.join(sh_a)
    .join(sh_b) runs the full corpus feature pass twice, and Spark's
    ReuseExchange cannot share it because the feature projection sits
    above the exchange (moving it below serializes the projection into
    the lone pre-exchange task — measured 2.4x slower). The melted
    matches regroup on the pair key — a shuffle bounded by candidate
    volume (which the bucket cap bounds), not corpus size. At sf0.1 the
    two shapes bench within noise of each other (corpus featurize is
    ~0.2 s); the win is structural — at 100 TB the removed probe is a
    full corpus scan+featurize.
    """
    melted = cand.select(
        "doc_a", "doc_b",
        F.explode(F.array(
            F.struct(F.lit("a").alias("side"), F.col("doc_a").alias("doc_id")),
            F.struct(F.lit("b").alias("side"), F.col("doc_b").alias("doc_id")),
        )).alias("s")).select("doc_a", "doc_b", "s.side", "s.doc_id")
    pairs = (
        melted.join(features, "doc_id")
        .groupBy("doc_a", "doc_b")
        .agg(F.first(F.when(F.col("side") == "a", F.col("sh")),
                     ignorenulls=True).alias("sh_a"),
             F.first(F.when(F.col("side") == "b", F.col("sh")),
                     ignorenulls=True).alias("sh_b"))
    )
    return (
        pairs
        .withColumn("jaccard", F.round(T.jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str,
                      num_hashes: int = 16, bands: int = 4,
                      jaccard_threshold: float = 0.5) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, verified with true shingle
    Jaccard. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.

    ONE tokenize pass total (codegen min-aggs + the doc's distinct
    feature-hash set aggregated together, ``with_feature_set``) ->
    banded buckets -> within-bucket combinations -> Jaccard verify on
    the hash sets (identical to string-set Jaccard up to 64-bit
    collisions; the old separate featurize pass re-scanned and
    re-tokenized the corpus). The full cross join never happens.
    Rows-only correctness check (murmur3 not in DuckDB).
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = minhash_signature_agg(d, num_hashes=num_hashes,
                                 with_feature_set=True)
    cand = lsh_band_candidates(sigs.select("doc_id", "minhash"),
                               num_hashes, bands)
    feats = sigs.select("doc_id", F.col("fset").alias("sh"))
    return verify_pairs_jaccard(cand, feats, jaccard_threshold)


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
                       threshold: float = 0.9,
                       num_hashes: int = 32, bands: int = 4) -> DataFrame:
    """Character-3-gram Jaccard near-dups, blocked by CHARACTER-level
    MinHash band buckets (vs the word-shingle MinHash of
    ``minhash_lsh_pairs`` — char grams catch within-word edits and
    whitespace/punctuation variants that word shingles blow up on).

    Blocking was previously the first-16-chars of canonical text — a
    skew bomb: natural-language prefixes ("the ...") collide massively,
    making within-block pairs quadratic on real corpora. MinHash band
    buckets distribute uniformly by construction; block size tracks
    true near-dup cluster size, not prefix popularity (pinned by
    ``tests/test_dedup_similarity.py::test_ngram_blocking_skew``).

    Band geometry matters MORE for char grams than word shingles: two
    unrelated same-language docs already share ~0.3-0.5 of their
    trigram set, so a permissive S-curve (8 bands x 2 rows: P=0.9 at
    j=0.5!) admits nearly every pair and the verify join goes quadratic
    (measured 106 s at sf0.1). 4 bands x 8 rows puts the knee at the
    0.9 threshold: P[candidate] = 1-(1-j^8)^4 = 0.90 at j=0.9 (1.0 for
    exact dups) but 0.015 at j=0.5. Rows-only check (murmur3 not in
    DuckDB).
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = minhash_signature_agg(d, num_hashes=num_hashes,
                                 tokens=lambda c: T.char_ngrams(c, 3),
                                 with_feature_set=True)
    cand = lsh_band_candidates(sigs.select("doc_id", "minhash"),
                               num_hashes, bands)
    feats = sigs.select("doc_id", F.col("fset").alias("sh"))
    return verify_pairs_jaccard(cand, feats, threshold)


def simhash_near_dups(spark: SparkSession, sf_dir: str,
                      max_hamming: int = 3) -> DataFrame:
    """Banded Hamming-k SimHash near-dups: split the 64-bit signature
    into 4 x 16-bit bands, bucket per band, verify candidates with the
    true Hamming distance. By pigeonhole, any pair within
    ``max_hamming`` <= 3 differing bits shares at least one intact band,
    so recall at Hamming<=3 is exact — unlike ``simhash_buckets``,
    which only finds identical signatures (Hamming-0).

    Plan: one signature pass -> 4-way band explode -> within-bucket
    combinations (one shuffle) -> xor/bit_count verify on candidates;
    never a cross join. Rows-only check (xxhash64 not in DuckDB).
    """
    d = table(spark, sf_dir, "documents")
    sigs = simhash64_agg(d)
    # 16-bit band values as an array signature -> reuse the banded-LSH
    # candidate machinery (4 bands of 1 array slot each)
    band_sigs = sigs.select(
        "doc_id",
        F.array(*[F.shiftrightunsigned("sig", 16 * b)
                  .bitwiseAND(F.lit(0xFFFF)).cast("int")
                  for b in range(4)]).alias("bands"),
    )
    cand = lsh_band_candidates(band_sigs, num_hashes=4, bands=4,
                               sig_col="bands")
    sig_a = sigs.withColumnsRenamed({"doc_id": "doc_a", "sig": "sig_a"})
    sig_b = sigs.withColumnsRenamed({"doc_id": "doc_b", "sig": "sig_b"})
    return (
        cand.join(sig_a, "doc_a").join(sig_b, "doc_b")
        .withColumn("hamming",
                    F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_clusters(spark: SparkSession, sf_dir: str,
                   rounds: int = 2) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the verified
    MinHash-LSH pair graph via ``rounds`` of min-label propagation —
    the survivor-selection step of corpus dedup (every member maps to
    its cluster's minimum doc_id).

    Each round joins labels to the symmetric edge list and takes the
    elementwise min (one shuffle per round, both on doc id). Near-dup
    clusters are dense (cliques/stars around the min member — the LSH
    cap in ``lsh_band_candidates`` emits star pairs by construction),
    and min-label reach roughly doubles per round (a neighbor's label
    may itself be several hops old), so 2 rounds resolves diameter-3
    chains — ample for real corpora; a production run at unknown
    diameter iterates to fixpoint with periodic reliable checkpoints
    instead of a fixed round count. Each round's plan re-evaluates the
    pair pipeline (no caching: lazily-returned frames must not pin
    CacheManager entries), so rounds is also a cost knob. Rows-only check
    (murmur3 not in DuckDB); chain-transitivity pinned by
    ``tests/test_dedup_similarity.py::test_dedup_clusters_chain``.
    """
    d = table(spark, sf_dir, "documents").select("doc_id")
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sym = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")) \
        .union(pairs.select(F.col("doc_b").alias("src"),
                            F.col("doc_a").alias("dst")))
    labels = d.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(rounds):
        nb = (sym.join(labels.withColumnsRenamed(
                  {"doc_id": "dst", "label": "dst_label"}), "dst")
              .groupBy("src").agg(F.min("dst_label").alias("nb_label")))
        labels = (labels.join(nb, labels.doc_id == nb.src, "left")
                  .select("doc_id",
                          F.least("label", F.coalesce("nb_label", "label"))
                          .alias("label")))
    return (labels.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") > 1)
            .select(F.col("label").alias("cluster_id"), "n_docs"))


QUERIES: dict[str, QueryFn] = {
    "dedup_exact": dedup_exact,
    "dedup_fingerprint": dedup_fingerprint,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "simhash_buckets": simhash_buckets,
    "simhash_near_dups": simhash_near_dups,
    "ngram_jaccard_dups": ngram_jaccard_dups,
    "dedup_clusters": dedup_clusters,
}

# rows-only entries (minhash/simhash/ngram) intentionally absent here
ORACLES: dict[str, str] = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_fingerprint": DEDUP_FINGERPRINT_SQL,
}
