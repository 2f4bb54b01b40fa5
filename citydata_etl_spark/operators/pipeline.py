"""Training-data pipeline operators (north-star extensions, BASELINE.json).

The corpus-preparation surface a large-scale LLM training pipeline needs
once dedup/similarity (operators/dedup.py, operators/similarity.py) have
produced their verdicts: deterministic splits, stratified sampling,
test-set contamination detection, cleaned-corpus materialization, sequence
packing, and shard balancing. The reference repo stops at collection
(README.md:6-7 states the downstream objective); these operators are the
engine's realization of that downstream layer over the `documents` table.

Determinism contract: every operator here is pure integer/rational
arithmetic over (doc_id, token arrays) — no RNG, no floating-point
accumulation order, no driver-side state — so the DuckDB oracle reproduces
each result bit-for-bit, and a re-run over re-partitioned data yields the
same assignments (the property that makes splits/samples auditable).

Scale posture (100 TB): every operator is one scan plus at most one
shuffle on a bounded key (stratum, shard, shingle). Splits and samples
hash doc_id with an LCG folded into codegen literals — at extreme id
ranges (>2^31 docs) swap the LCG for xxhash64(doc_id), trading
oracle-exactness for an unbounded domain; topology is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from citydata_etl_spark.operators.dedup import (
    dedup_groups,
    minhash_lsh_pairs,
    shingles,
)

HASH_PRIME = 2147483647  # 2^31 - 1
_SPLIT_A = 2654435761  # Knuth multiplicative constant
_SPLIT_B = 12345


def _id_bucket(id_col: str, n_buckets: int):
    """Deterministic bucket in [0, n_buckets) from an integer id — LCG mod
    prime, then mod buckets. Pure BIGINT arithmetic (safe for ids < 2^31;
    see module docstring for the xxhash64 swap beyond that)."""
    return (
        (F.col(id_col).cast("bigint") * _SPLIT_A + _SPLIT_B) % HASH_PRIME
    ) % n_buckets


def train_split(
    docs: DataFrame, train_pct: int = 80, val_pct: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test split by hashed id: (id, bucket, split).

    The split is a pure function of the id — stable under re-partitioning,
    re-runs, and corpus growth (a doc never migrates between splits when
    new docs arrive), which is the property that keeps eval sets
    uncontaminated across pipeline versions. Narrow (no shuffle): the
    bucket is a codegen expression on the scan.
    """
    bucket = _id_bucket(id_col, 100)
    return docs.select(
        F.col(id_col),
        bucket.cast("bigint").alias("bucket"),
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def stratified_sample_stats(
    docs: DataFrame, rate_pct: int = 20, strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling summary: per stratum, total docs,
    sampled docs (id-hash bucket < rate_pct), and the realized rate.

    The per-row keep decision is the same narrow _id_bucket expression as
    train_split (independent constants would use a different seed term);
    the only shuffle is the final small groupBy on the stratum key. The
    realized-rate column is the auditing output: a stratum whose realized
    rate drifts far from rate_pct signals id-space structure (e.g.
    sequential ids assigned per-source) that calls for a stronger hash.
    """
    keep = _id_bucket(id_col, 100) < rate_pct
    return (
        docs.withColumn("_keep", keep)
        .groupBy(F.col(strata_col).alias("stratum"))
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.col("_keep").cast("bigint")).alias("n_sampled"),
            F.round(
                F.sum(F.col("_keep").cast("bigint"))
                / F.count("*").cast("double"),
                6,
            ).alias("realized_rate"),
        )
    )


def contamination(
    docs: DataFrame, n: int = 4, holdout_mod: int = 23,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Test-set contamination report: for every TRAIN doc sharing at least
    one word n-gram with the held-out set, (doc_id, n_hits, n_shingles,
    contamination_ratio).

    Held-out membership is deterministic (id % holdout_mod == 0) so the
    check is self-contained; in production the held-out side is the eval
    benchmark corpus. Plan shape: ONE shingle explode over the train corpus
    (the holdout predicate pushes down to the scan), LEFT-joined against
    the broadcast distinct held-out shingle set so per-doc totals and hit
    counts come out of a single groupBy — the corpus is scanned once and
    never shuffled except on (doc, shingle). The held-out set is
    benchmark-sized (bounded), hence broadcast, which is what makes n-gram
    decontam feasible at 100 TB (the corpus streams past a hash set).
    """
    sh = shingles(docs, n, text_col, id_col)
    is_held = (F.col(id_col) % holdout_mod) == 0
    held = (
        sh.filter(is_held)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train_sh = sh.filter(~is_held)
    per_doc = (
        train_sh.join(F.broadcast(held), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hits"),
        )
    )
    return per_doc.filter(F.col("n_hits") > 0).select(
        id_col,
        "n_hits",
        "n_shingles",
        F.round(
            F.col("n_hits") / F.col("n_shingles").cast("double"), 6
        ).alias("contamination_ratio"),
    )


def cleaned_corpus_ids(
    docs: DataFrame, num_hashes: int = 16, band_size: int = 4,
    shingle_n: int = 2, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end near-dedup decision: the ids a cleaned corpus KEEPS —
    every doc that is either untouched by the MinHash-LSH pair graph or is
    the canonical (minimum-id) member of its connected component.

    This is the composition that turns the dedup primitives into an actual
    corpus filter: minhash_lsh_pairs -> dedup_groups -> anti-join of the
    non-canonical ids against the corpus. The anti-join side (docs that
    LOSE) is far smaller than the corpus, so it broadcasts; the corpus
    itself is never shuffled.
    """
    pairs = minhash_lsh_pairs(
        docs, num_hashes=num_hashes, band_size=band_size,
        shingle_n=shingle_n, text_col=text_col, id_col=id_col,
    )
    groups = dedup_groups(pairs)
    losers = groups.filter(F.col("doc_id") != F.col("group_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(F.broadcast(losers), id_col, "left_anti").select(id_col)


def pack_sequences(
    docs: DataFrame, ctx_len: int = 512, n_shards: int = 8,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-split sequence packing plan: assign every doc a shard,
    a pack (context-window) index, and a token offset, by streaming docs
    in id order through fixed ctx_len windows per shard.

    Output: (id, shard, n_tokens, pack_id, offset) where pack_id/offset
    locate the doc's FIRST token in the shard's concatenated token stream
    — the standard GPT-style packing layout (docs may straddle pack
    boundaries; the trainer masks across them).

    Scale shape: the cumulative sum runs per shard (window PARTITION BY
    shard), so parallelism = n_shards and no global sort exists. At 100 TB
    raise n_shards to O(executors); determinism comes from the id-ordered
    window, not arrival order.
    """
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    ).cast("bigint")
    shard = (F.col(id_col) % n_shards).cast("bigint")
    w = (
        W.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_cum = docs.select(
        F.col(id_col), shard.alias("shard"), n_tokens.alias("n_tokens")
    ).withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return with_cum.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(start / ctx_len).cast("bigint").alias("pack_id"),
        (start % ctx_len).cast("bigint").alias("offset"),
    )


def shard_stats(
    docs: DataFrame, n_shards: int = 16,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Shard-assignment balance report: per hashed shard, doc count, total
    tokens, and min/max doc id — the skew audit run before committing a
    partitioning for a training job. One narrow projection + one bounded
    groupBy (n_shards groups)."""
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    ).cast("bigint")
    return (
        docs.select(
            _id_bucket(id_col, n_shards).cast("bigint").alias("shard"),
            F.col(id_col),
            n_tokens.alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )


def curation_summary(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_quality: float = 0.5, holdout_mod: int = 23,
) -> DataFrame:
    """The end-to-end corpus-curation pipeline as ONE composed plan:
    per train/val/test split, how many docs survive quality gating,
    English language ID, near-dedup, and contamination screening — and
    how many tokens the curated corpus keeps.

    Composition (all prior operators, no new semantics):
      quality_score >= min_quality  AND  lang_pred == 'en'
      AND kept by cleaned_corpus_ids (MinHash-LSH -> connected components)
      AND not contaminated (no 4-gram overlap with the held-out set,
          held-out docs themselves excluded)
      grouped by train_split bucket.

    Scale shape: the corpus is scanned by each feature branch and reduced
    before joining — quality/lang are narrow per-row expressions, the
    dedup loser set and contaminated-id set are both FAR smaller than the
    corpus and broadcast into anti-joins. Output is a bounded 3-row
    summary: the shape of a curation report at any corpus size.
    """
    from citydata_etl_spark.operators.text import lang_id, quality_score

    q = quality_score(docs, text_col, id_col).select(id_col, "quality")
    lid = lang_id(docs, text_col, id_col).select(id_col, "lang_pred")
    kept = cleaned_corpus_ids(docs, text_col=text_col, id_col=id_col)
    contaminated = contamination(
        docs, n=4, holdout_mod=holdout_mod, text_col=text_col, id_col=id_col
    ).select(id_col)
    split = train_split(docs, id_col=id_col).select(id_col, "split")
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    ).cast("bigint")
    base = docs.select(F.col(id_col), n_tokens.alias("n_tokens")).filter(
        (F.col(id_col) % holdout_mod) != 0
    )
    survivors = (
        base.join(q, id_col)
        .join(lid, id_col)
        .filter(
            (F.col("quality") >= min_quality) & (F.col("lang_pred") == "en")
        )
        .join(kept, id_col, "left_semi")
        .join(F.broadcast(contaminated), id_col, "left_anti")
        .join(split, id_col)
    )
    return survivors.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
