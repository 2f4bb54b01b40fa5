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

from citydata_etl_spark.operators import text as TX
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
    shingle_rel: DataFrame | None = None,
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

    shingle_rel, when given, is a precomputed SET-semantics (id, shingle)
    relation for the same (docs, n) (caching.keyed_persist /
    readers.read_doc_shingle_set, shared with the MinHash and Jaccard
    consumers) — the scan+explode+distinct runs once per sweep.
    """
    sh = (
        shingle_rel
        if shingle_rel is not None
        else shingles(docs, n, text_col, id_col)
    )
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


def dedup_losers(
    docs: DataFrame, num_hashes: int = 16, band_size: int = 4,
    shingle_n: int = 2, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """The ids a cleaned corpus DROPS: every non-canonical (non-minimum-id)
    member of a MinHash-LSH duplicate component. Pair-graph-sized — a
    corpus FRACTION, not the corpus — so it is always the broadcastable
    side of the downstream anti-join."""
    pairs = minhash_lsh_pairs(
        docs, num_hashes=num_hashes, band_size=band_size,
        shingle_n=shingle_n, text_col=text_col, id_col=id_col,
    )
    groups = dedup_groups(pairs)
    return groups.filter(F.col("doc_id") != F.col("group_id")).select(
        F.col("doc_id").alias(id_col)
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
    non-canonical ids (dedup_losers) against the corpus. The anti-join side
    is far smaller than the corpus, so it broadcasts; the corpus itself is
    never shuffled.
    """
    losers = dedup_losers(
        docs, num_hashes=num_hashes, band_size=band_size,
        shingle_n=shingle_n, text_col=text_col, id_col=id_col,
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

    Composition (all prior operators' semantics, no new ones):
      quality_score >= min_quality  AND  lang_pred == 'en'
      AND not a dedup_losers id (MinHash-LSH -> connected components)
      AND not contaminated (no 4-gram overlap with the held-out set,
          held-out docs themselves excluded)
      grouped by the train_split bucket.

    Scale shape: ONE corpus scan. Quality, language, n_tokens, and the
    split are narrow codegen expressions evaluated inline on that scan
    (quality_expr / lang_pred_expr / _id_bucket — per-row functions never
    become join sides). The only joins are anti-joins against the two
    corpus-FRACTION-sized id sets (dedup losers, contaminated ids), both
    broadcast. Nothing corpus-sized is ever shuffled or broadcast; output
    is a bounded 3-row summary at any corpus size.
    """
    from citydata_etl_spark.operators.text import lang_pred_expr, quality_expr

    losers = dedup_losers(docs, text_col=text_col, id_col=id_col)
    contaminated = contamination(
        docs, n=4, holdout_mod=holdout_mod, text_col=text_col, id_col=id_col
    ).select(id_col)
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    ).cast("bigint")
    bucket = _id_bucket(id_col, 100)
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    survivors = (
        docs.select(
            F.col(id_col),
            n_tokens.alias("n_tokens"),
            quality_expr(text_col).alias("quality"),
            lang_pred_expr(text_col).alias("lang_pred"),
            split.alias("split"),
        )
        .filter((F.col(id_col) % holdout_mod) != 0)
        .filter(
            (F.col("quality") >= min_quality) & (F.col("lang_pred") == "en")
        )
        .join(F.broadcast(losers), id_col, "left_anti")
        .join(F.broadcast(contaminated), id_col, "left_anti")
    )
    return survivors.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def domain_mix(
    docs: DataFrame, weights: dict[str, float] | None = None,
    source_col: str = "source", text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-mixing plan: given target mix weights over sources (uniform
    when None), the per-source keep rates realizing the LARGEST corpus
    that satisfies the mix exactly — the water-filling solution
    N = min_s(T_s / w_s), keep_rate_s = N * w_s / T_s (the binding source
    keeps everything; every other source downsamples to match).

    Scale shape: ONE shuffle — the per-source token totals (map-side
    combinable groupBy). The water-fill itself runs over the BOUNDED
    per-source aggregate (n_sources rows) via an unpartitioned window,
    which is fine precisely because the input is dimension-sized; the
    corpus is never re-scanned. Output: (source, n_docs, total_tokens,
    target_weight, keep_rate).
    """
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    )
    agg = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tokens).cast("bigint").alias("total_tokens"),
    )
    wspec = W.partitionBy(F.lit(1))
    if weights is None:
        with_w = agg.select(
            "*",
            (1.0 / F.count("*").over(wspec)).alias("_w"),
        )
    else:
        wmap = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv]
        )
        with_w = agg.select("*", wmap[F.col(source_col)].alias("_w"))
    capped = with_w.select(
        "*",
        F.min(F.col("total_tokens") / F.col("_w")).over(wspec).alias("_cap"),
    )
    return capped.select(
        source_col,
        "n_docs",
        "total_tokens",
        F.round(F.col("_w"), 6).alias("target_weight"),
        F.round(
            F.least(
                F.lit(1.0),
                F.col("_cap") * F.col("_w") / F.col("total_tokens"),
            ),
            6,
        ).alias("keep_rate"),
    )


def temperature_mix(
    docs: DataFrame, alpha: float = 0.5,
    source_col: str = "source", text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled domain mixing — the multilingual/domain
    sampling rule (alpha in (0, 1] upweights low-resource domains, as in
    multilingual pretraining): target weight w_s ~ (T_s / T)^alpha,
    normalized, then the same water-fill as domain_mix realizes the
    LARGEST corpus satisfying that mix exactly (N = min_s T_s / w_s,
    keep_rate_s = N * w_s / T_s).

    alpha = 1 reproduces the natural distribution (every keep_rate = 1);
    alpha -> 0 approaches the uniform mix (domain_mix's default).

    Scale shape: identical to domain_mix — ONE map-side-combinable
    groupBy(source); temperature scaling and the water-fill run over the
    BOUNDED per-source aggregate (n_sources rows, unpartitioned windows
    are dimension-sized by construction). Output: (source, n_docs,
    total_tokens, target_weight, keep_rate), rounded to 6 dp (pow is
    transcendental — rounding absorbs last-ulp libm differences, the
    same convention as every transcendental output in the catalog).
    """
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    )
    agg = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tokens).cast("bigint").alias("total_tokens"),
    )
    wspec = W.partitionBy(F.lit(1))
    scaled = agg.select(
        "*",
        F.pow(
            F.col("total_tokens")
            / F.sum("total_tokens").over(wspec),
            F.lit(alpha),
        ).alias("_pa"),
    )
    weighted = scaled.select(
        "*", (F.col("_pa") / F.sum("_pa").over(wspec)).alias("_w")
    )
    capped = weighted.select(
        "*",
        F.min(F.col("total_tokens") / F.col("_w")).over(wspec).alias("_cap"),
    )
    return capped.select(
        source_col,
        "n_docs",
        "total_tokens",
        F.round(F.col("_w"), 6).alias("target_weight"),
        F.round(
            F.least(
                F.lit(1.0),
                F.col("_cap") * F.col("_w") / F.col("total_tokens"),
            ),
            6,
        ).alias("keep_rate"),
    )


def stratified_fixed_sample(
    docs: DataFrame, k: int,
    strata_col: str = "source", id_col: str = "doc_id",
) -> DataFrame:
    """FIXED-SIZE deterministic sample per stratum — the reservoir-sample
    analog for eval-set construction (exactly k docs per source, not a
    rate): rank each stratum by the id-hash coin lcg(doc_id) and keep the
    k smallest. Deterministic and stable under re-partitioning AND under
    corpus growth in OTHER strata (a doc's coin never changes; only new
    docs in its own stratum can displace it) — the property that makes a
    frozen eval slice re-derivable from the raw corpus.

    One shuffle on the stratum + a PARTITIONED row_number window.
    Output: (doc_id, strata, coin, sample_rank), sample_rank <= k.
    """
    coin = (
        (F.col(id_col) * F.lit(_SPLIT_A) + F.lit(_SPLIT_B)) % HASH_PRIME
    ).cast("bigint")
    scored = docs.select(id_col, strata_col, coin.alias("coin"))
    w = W.partitionBy(strata_col).orderBy("coin", id_col)
    return (
        scored.withColumn(
            "sample_rank", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("sample_rank") <= k)
    )


def domain_mix_apply(
    docs: DataFrame, weights: dict[str, float] | None = None,
    resolution: int = 1_000_000,
    source_col: str = "source", text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize domain_mix's water-fill PLAN into an actual subsample:
    doc kept iff lcg(doc_id) mod resolution < round(keep_rate *
    resolution) for its source — the deterministic coin flip that makes
    the sampled corpus reproducible and auditable (same contract as
    train_split: stable under re-partitioning and corpus growth).

    Scale shape: the rates table is dimension-sized (one row per source)
    and broadcast; the corpus scans ONCE with a codegen filter — the only
    shuffle is domain_mix's own per-source aggregate. Output: every doc
    with (source, keep_rate, keep), drops auditable.
    """
    rates = domain_mix(
        docs, weights, source_col=source_col,
        text_col=text_col, id_col=id_col,
    ).select(source_col, "keep_rate")
    coin = (
        (F.col(id_col) * F.lit(_SPLIT_A) + F.lit(_SPLIT_B)) % HASH_PRIME
    ) % resolution
    thr = F.floor(F.col("keep_rate") * resolution + F.lit(0.5))
    return (
        docs.select(id_col, source_col)
        .join(F.broadcast(rates), source_col)
        .select(
            id_col,
            source_col,
            "keep_rate",
            F.when(coin < thr, F.lit(1)).otherwise(0).alias("keep"),
        )
    )


def domain_cap(
    docs: DataFrame, cap: int,
    source_col: str = "source", text_col: str = "text",
    id_col: str = "doc_id", prefilter: bool = False,
) -> DataFrame:
    """Per-domain document cap — the web-corpus curation rule that bounds
    any single domain's share of the training mix (C4/Gopher-style:
    boilerplate-heavy domains otherwise dominate after crawl): keep at
    most `cap` docs per source, ranked by (quality desc, id asc).

    prefilter=False (the oracle-exact audit form): output (doc_id,
    source, quality, domain_rank, keep) for EVERY input doc — the drop
    set stays auditable, like semantic_dedup's keep flag. One shuffle on
    source + a per-domain sort (row_number window partitioned by source —
    never unpartitioned). The hazard is a mega-domain making one
    partition's sort huge.

    prefilter=True (the mega-domain scale form): an approximate per-source
    quality quantile at a CONSTANT fraction (approx_percentile(quality,
    1 - prefilter_frac, accuracy 10_000) — the percentage must be foldable)
    pre-cuts each domain BEFORE the exact rank, so the window sorts
    ~prefilter_frac of a mega-domain instead of its full population;
    sources too small for the cut to be safe (n <= 2*cap/prefilter_frac)
    skip it and rank exactly. Output is the KEPT rows only (keep == 1 by
    construction). The keep set equals the exact form's whenever
    n_source <= accuracy*cap: for gated-through sources trivially, and
    past the gate the cut keeps ~prefilter_frac*n >= 2*cap rows with
    quantile rank error bounded by n/accuracy, so at least cap survivors
    sit above the threshold — property-tested; the comparison is >= so
    quantile ties only ADD survivors, never drop them.
    """
    prefilter_frac = 0.1
    scored = docs.select(
        id_col, source_col, TX.quality_expr(text_col).alias("quality")
    )
    if prefilter:
        thr = scored.groupBy(source_col).agg(
            F.count("*").alias("__n"),
            F.percentile_approx(
                "quality", F.lit(1.0 - prefilter_frac), F.lit(10_000)
            ).alias("__thr"),
        )
        scored = (
            scored.join(F.broadcast(thr), source_col)
            .filter(
                (F.col("__n") <= 2 * cap / prefilter_frac)
                | (F.col("quality") >= F.col("__thr"))
            )
            .drop("__n", "__thr")
        )
    w = W.partitionBy(source_col).orderBy(F.desc("quality"), id_col)
    out = scored.withColumn(
        "domain_rank", F.row_number().over(w).cast("bigint")
    ).withColumn(
        "keep",
        F.when(F.col("domain_rank") <= cap, F.lit(1)).otherwise(0),
    )
    return out.filter(F.col("keep") == 1) if prefilter else out


def quality_funnel(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style filter-funnel audit (Rae et al. 2021, A1.1: the
    sequence of document filters applied cumulatively): ONE corpus scan,
    ONE 1-row aggregate — per filter stage, how many docs survive all
    stages up to and including it, plus the surviving token mass.

    Stages (cheap inline exprs; each a [[text.py]] -style builder):
      0 non_empty     n_tokens >= 1
      1 min_length    n_tokens >= 16
      2 word_shape    2 <= mean_token_len <= 12
      3 stopword_en   stopword ratio >= 0.05
      4 repetition    distinct-token ratio > 0.3 (unigram proxy for the
                      dup-n-gram family; the n-gram form is
                      dedup.dup_passage_stats / text.repetition_stats)

    Output: (stage, stage_name, n_surviving, tokens_surviving) — the
    drop-off report every curation run ships.

    Scale shape: indicator sums fuse into one partial+final hash agg (a
    1-row result), the unpivot is a stack() over that row — the corpus is
    read exactly once, nothing shuffles but 32 partial-agg rows.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_spaces = n_chars - F.length(F.regexp_replace(text_col, " ", ""))
    # try_divide: a 0-token doc must fail the funnel (null ratio -> null
    # condition -> false under AND), not raise under ANSI mode
    mean_len = F.try_divide((n_chars - n_spaces).cast("double"), n_tokens)
    sw = F.array(*[F.lit(w) for w in TX.EN_STOPWORDS])
    sw_ratio = F.try_divide(
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast(
            "double"
        ),
        n_tokens,
    )
    distinct_ratio = F.try_divide(
        F.size(F.array_distinct(toks)).cast("double"), n_tokens
    )
    stages = [
        ("non_empty", n_tokens >= 1),
        ("min_length", n_tokens >= 16),
        ("word_shape", (mean_len >= 2.0) & (mean_len <= 12.0)),
        ("stopword_en", sw_ratio >= 0.05),
        ("repetition", distinct_ratio > 0.3),
    ]
    aggs = []
    cum = F.lit(True)
    for i, (stage_name, cond) in enumerate(stages):
        cum = cum & cond
        aggs.append(
            F.sum(F.when(cum, 1).otherwise(0)).cast("bigint")
            .alias(f"__n_{i}")
        )
        aggs.append(
            F.sum(F.when(cum, n_tokens).otherwise(0)).cast("bigint")
            .alias(f"__t_{i}")
        )
    wide = docs.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({i} AS BIGINT), '{name}', __n_{i}, __t_{i}"
        for i, (name, _) in enumerate(stages)
    )
    return wide.selectExpr(
        f"stack({len(stages)}, {stack_args}) AS "
        "(stage, stage_name, n_surviving, tokens_surviving)"
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 16,
    stride: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token windows — the
    context-window chunking step upstream of embedding / packing (window
    tokens per chunk, stride tokens between chunk starts, so consecutive
    chunks overlap by window - stride).

    Chunk count per doc is max(ceil((n - window)/stride) + 1, 1): every
    token is covered, the final chunk is never empty (its start is
    strictly inside the doc), and a doc shorter than one window yields
    exactly one chunk.  Output: (id, chunk_idx, chunk_text, n_tokens).

    Scale shape: split + sequence + posexplode-free explode, all
    codegen, zero exchanges — the same embarrassingly-parallel posture
    as the other per-doc projections.  Output row count is
    sum(chunks per doc) ~ corpus_tokens / stride.
    """
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    n = F.size(toks)
    n_chunks = F.greatest(
        (F.ceil((n - F.lit(window)) / F.lit(float(stride)))
         + F.lit(1)).cast("bigint"),
        F.lit(1).cast("bigint"),
    )
    base = docs.select(
        id_col, toks.alias("_toks"), n.alias("_n"), n_chunks.alias("_nc")
    )
    c = F.col("_c")
    start = c * stride  # 0-based chunk start
    piece = F.slice("_toks", (start + 1).cast("int"), window)
    return base.select(
        id_col,
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("_nc") - 1))
        .alias("_c"),
        "_toks",
        "_n",
    ).select(
        id_col,
        c.alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        (F.least(start + window, F.col("_n")) - start)
        .cast("bigint")
        .alias("n_tokens"),
    )


def negative_pairs(
    docs: DataFrame,
    k: int = 4,
    per_bucket: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic pseudo-random NEGATIVE sampling — k contrastive
    partners per anchor document, the pair-generation step for
    contrastive / reranker training sets.

    The naive form (ORDER BY random() per anchor) is a global shuffle
    of the corpus per probe; the scale form here is a bucketed gather:
      1. every doc gets a pseudo-random bucket rb out of nb = max(N /
         per_bucket, 1) buckets, so bucket occupancy ~ per_bucket at ANY
         corpus size;
      2. each (anchor, probe i) computes a target bucket tb and gathers
         that bucket's docs through ONE equi-join (output ~ k *
         per_bucket * N rows — linear, never quadratic);
      3. per (anchor, i) the partner is the candidate minimizing an
         injective order key (map-side-combinable min_by), self
         excluded.
    All arithmetic is integer LCG mod 2^31-1 (the repo's minhash
    convention) so the DuckDB oracle reproduces the sample bit-exactly;
    at 100 TB swap the LCGs for xxhash64 — identical topology, better
    mixing, no oracle (the same trade minhash_lsh's id_mode makes).
    A probe whose bucket contains only the anchor yields no pair
    (deterministic on both sides).
    """
    P = 2147483647
    n1 = docs.agg(
        F.greatest(
            (F.count("*") / per_bucket).cast("bigint"), F.lit(1).cast("bigint")
        ).alias("nb")
    )
    d = F.col(id_col)
    # Reduce the id mod 2^31 BEFORE the LCG multiplies: 2^31 * 2654435761
    # < 2^63, so BIGINT arithmetic never overflows (ANSI mode would
    # hard-fail the job on ids above ~3.4e9 otherwise); ids below 2^31
    # are unchanged, and the oracle applies the same reduction.
    dm = F.pmod(d, F.lit(2147483648))
    buckets = docs.crossJoin(F.broadcast(n1)).select(
        d.alias("cand_id"),
        ((dm * 2654435761 + 104729) % P % F.col("nb")).alias("rb"),
        (((dm * 48271 + 777) % P) * 2147483648 + F.pmod(d, 2147483648))
        .alias("ord"),
    )
    probes = (
        docs.crossJoin(F.broadcast(n1))
        .select(
            d.alias("anchor"),
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
            "nb",
        )
        .select(
            "anchor",
            F.col("_i").cast("bigint").alias("probe_idx"),
            (
                (F.pmod(F.col("anchor"), F.lit(2147483648)) * 40503
                 + F.col("_i") * 69061 + 12345)
                % P
                % F.col("nb")
            ).alias("tb"),
        )
    )
    cand = probes.join(
        buckets, probes.tb == buckets.rb, "inner"
    ).filter(F.col("cand_id") != F.col("anchor"))
    return cand.groupBy("anchor", "probe_idx").agg(
        F.min_by("cand_id", "ord").alias("partner")
    )


def dsir_importance(
    target: DataFrame, candidates: DataFrame,
    n_buckets: int = 256, k: int = 200, seed: int = 7,
    text_col: str = "text", id_col: str = "doc_id",
    feature_mode: str = "rank",
) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): estimate bag-of-hashed-bigram distributions for a
    clean TARGET corpus and the RAW candidate pool, weight every
    candidate by its log importance ratio, and draw k examples with the
    Gumbel-top-k trick (equivalent to sampling without replacement with
    probability proportional to the importance weight).

    Determinism contract (the engine's standard conventions):
      - grams are word bigrams (docs with < 2 tokens are excluded on
        both sides — they have no bigram evidence);
      - the feature hash is the dense lexicographic gram rank
        (ranked_tokens — oracle-exact) folded through the LCG
        (pmod(tid, 2^31-1) * 2654435761 + 11) % (2^31-1) % n_buckets
        (ids reduced mod the prime BEFORE the multiply so the product
        stays inside int64 for any input — identity for the fixture
        range); at corpus scale pass feature_mode='hash' to swap the
        rank for pmod(xxhash64(gram), prime) exactly as
        minhash_lsh_pairs' id_mode='hash' does — topology unchanged;
      - per-bucket log ratio is Laplace-smoothed and rounded ONCE to
        integer micros: floor((ln(ct+1) - ln(Tt+B) - ln(cr+1)
        + ln(Tr+B)) * 1e6 + 0.5), stated left-to-right so both engines
        evaluate the identical float64 expression of integer inputs;
        per-doc weights are then associative BIGINT sums of occurrence
        weights;
      - the Gumbel key derives from a seeded LCG uniform
        u = ((pmod(id, 2^31-1) * 2654435761 + seed*40503 + 11)
        % (2^31-1) + 1) / 2147483649.0 in (0,1): key_micros = weight_micros
        + floor(-ln(-ln(u)) * 1e6 + 0.5) — Gumbel(0,1) in micros;
      - selection is the k largest key_micros (ties: lower id wins).

    Output (candidates with >= 1 bigram): (doc_id, n_grams,
    weight_micros, key_micros, selected 0/1).

    Scale shape: gram extraction is a projection + explode; the rank
    is ranked_tokens' fused one-exchange form; bucket counts collapse
    map-side into <= n_buckets rows; the weight table is a broadcast
    (n_buckets rows) probed by one equi-join; per-doc weights are one
    hash aggregate; selection is orderBy().limit(k) — Spark plans
    TakeOrderedAndProject (no global sort materialization) — joined
    back as a flag. No window over the corpus, no driver collect.
    """
    from citydata_etl_spark.caching import scoped_persist
    from citydata_etl_spark.operators.dedup import ranked_tokens

    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")

    def grams(df: DataFrame, side: int) -> DataFrame:
        # shingles() on >= 2-token docs yields exactly size-1 true
        # bigrams per doc (its short-doc 1-gram degeneracy cannot
        # trigger past the size filter)
        sh = shingles(
            df.filter(F.size(toks) >= 2).select(id_col, text_col),
            n=2, text_col=text_col, id_col=id_col, distinct=False,
        )
        return sh.select(
            F.col(id_col), F.lit(side).alias("__side"),
            F.col("shingle").alias("token"),
        )

    if feature_mode not in ("rank", "hash"):
        raise ValueError(f"unknown feature_mode: {feature_mode!r}")
    g = scoped_persist(
        grams(target, 0).unionByName(grams(candidates, 1))
    )
    if feature_mode == "hash":
        # corpus-scale path (r16 VERDICT task 5, the minhash
        # id_mode='hash' precedent made a real code path instead of a
        # docstring): bucket straight off the gram bytes —
        # pmod(xxhash64(gram), prime) % n_buckets — so there is NO
        # vocabulary distinct + global rank at all. Engine-specific
        # (xxhash64), so entries on this path are rows-only; the
        # rank path below is the oracle-exact twin with identical
        # topology past this projection.
        bk = g.select(
            id_col, "__side",
            (F.pmod(F.xxhash64("token"), F.lit(HASH_PRIME))
             % F.lit(n_buckets)).cast("int").alias("bucket"),
        )
    else:
        bk = ranked_tokens(g).select(
            id_col, "__side",
            ((F.pmod(F.col("tid"), F.lit(HASH_PRIME)) * F.lit(_SPLIT_A)
              + F.lit(11))
             % F.lit(HASH_PRIME) % F.lit(n_buckets)).cast("int")
            .alias("bucket"),
        )
    bk = scoped_persist(bk)
    per_bucket = bk.groupBy("bucket").agg(
        F.sum(F.when(F.col("__side") == 0, 1).otherwise(0))
        .cast("bigint").alias("ct"),
        F.sum(F.when(F.col("__side") == 1, 1).otherwise(0))
        .cast("bigint").alias("cr"),
    )
    totals = per_bucket.agg(
        F.sum("ct").cast("bigint").alias("tt"),
        F.sum("cr").cast("bigint").alias("tr"),
    )
    lnd = lambda c: F.log(c.cast("double"))  # noqa: E731
    wtab = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.floor(
            (lnd(F.col("ct") + 1) - lnd(F.col("tt") + n_buckets)
             - lnd(F.col("cr") + 1) + lnd(F.col("tr") + n_buckets))
            * 1000000 + F.lit(0.5)
        ).cast("bigint").alias("w_micros"),
    )
    scores = (
        bk.filter(F.col("__side") == 1)
        .join(F.broadcast(wtab), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum("w_micros").cast("bigint").alias("weight_micros"),
        )
    )
    # Fold the id mod the prime BEFORE the multiply (the lcg_pick
    # convention, r16 ADVICE fix): the raw product id * 2654435761
    # silently wraps int64 past id ~ 3.47e9 in non-ANSI Spark (and a
    # negative id would give a negative modulus -> u <= 0 -> NaN
    # Gumbel -> a null key that desc-sorts last, silently never
    # selecting the doc). pmod bounds the product at
    # (2^31 - 2) * 2654435761 ~ 5.7e18 < int64 max for ANY id and
    # keeps u in (0, 1); for ids already in [0, 2^31 - 1) — every
    # fixture id — the fold is the identity, so outputs are
    # bit-identical to the r15 oracle.
    um = (F.pmod(F.col(id_col), F.lit(HASH_PRIME)) * F.lit(_SPLIT_A)
          + F.lit(seed * 40503 + 11)) % F.lit(HASH_PRIME)
    u = (um + F.lit(1)).cast("double") / F.lit(2147483649.0)
    gumbel = F.floor(-F.log(-F.log(u)) * 1000000 + F.lit(0.5)) \
        .cast("bigint")
    keyed = scoped_persist(scores.withColumn(
        "key_micros", (F.col("weight_micros") + gumbel).cast("bigint")
    ))
    sel = (
        keyed.orderBy(F.desc("key_micros"), F.asc(id_col)).limit(k)
        .select(F.col(id_col), F.lit(1).alias("__sel"))
    )
    return keyed.join(sel, id_col, "left").select(
        id_col, "n_grams", "weight_micros", "key_micros",
        F.coalesce(F.col("__sel"), F.lit(0)).cast("bigint")
        .alias("selected"),
    )
