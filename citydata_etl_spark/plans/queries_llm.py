"""North-star LLM-data-pipeline queries (SURVEY.md §2.8 D4, BASELINE.json):
dedup, near-dedup, similarity search, text analysis over the documents and
embeddings tables — each with a DuckDB oracle where the algorithm is
integer/rational-exact, rows-only where engine-specific (HLL, ANN recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from citydata_etl_spark.operators import dedup as D
from citydata_etl_spark.operators import similarity as S
from citydata_etl_spark.operators import text as TX
from citydata_etl_spark.plans.catalog import register
from citydata_etl_spark.sources.readers import read_testdata


def _spread_blob_feed(df: DataFrame) -> DataFrame:
    """Spread a per-blob Python feed across the executor cores before the
    synth/decode kernels run (r17 OPTIMIZATION; guide §2.5/§4 and
    operators/multimodal.py's own module posture: for mapInPandas media
    work, parallelism = partitions).

    The media entries derive their blob relations 1:1 from the documents
    table, which at the bench scale factors is a SINGLE parquet split
    (one row group) — effectively unsplittable input — so without this
    every downstream blob-synthesis + decode chain ran serially in ONE
    task while the other 31 cores idled (measured: d5_jpeg_pixels warm
    5.8 s -> 0.9 s with the feed spread; the whole chain is narrow, so
    the fixture's mapInPandas and every decode kernel after it inherit
    the feed's partitioning). Round-robin repartition of the id-width
    projection only — blob bytes are synthesized AFTER the exchange, so
    the shuffle moves a handful of bytes per row at any scale; at
    deployment scale, where blobs arrive from storage already split,
    input partitioning >= cores and the repartition is sized BY the same
    defaultParallelism the cluster reports. Placement never affects
    bytes: every builder is row-local (doc_id -> blob is a pure
    function; verified for each builder before this landed)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)

# Shared oracle CTE fragments (tokens + dense-rank vocabulary — the exact
# construction in operators/dedup.py: tokens/vocabulary).
_TOK = """
tok AS (
  SELECT DISTINCT doc_id, t AS token
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''),
vocab AS (
  SELECT token, row_number() OVER (ORDER BY token) - 1 AS tid
  FROM (SELECT DISTINCT token FROM tok)),
tt AS (SELECT doc_id, tid FROM tok JOIN vocab USING (token))
"""


@register(
    "d4_exact_dedup",
    oracle="""
    SELECT text, min(doc_id) AS canonical_id, count(*) AS n_dups
    FROM documents GROUP BY text
    """,
    doc="D4: exact dedup — hash-groupBy on content, canonical id = min "
    "(at scale: group on sha2(text) to shrink the shuffle).",
)
def d4_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(read_testdata(spark, sf_dir, "documents"))


@register(
    "d4_ngram_jaccard",
    oracle="""
    WITH tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 1, 1) + 1)) AS i
      FROM tokl),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 1 AS INT)], ' ')
               AS shingle
      FROM idx),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b)
    SELECT doc_a, doc_b,
           round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
    """,
    doc="D4: exact bigram-Jaccard near-dup pairs via PREFIX-FILTERED "
    "set-similarity join (AllPairs/PPJoin family): candidates must share "
    "one of their |d|-ceil(t*|d|)+1 globally-rarest shingles, then exact "
    "array_intersect verify — lossless pruning, proven equal to the naive "
    "inverted-index join by a hypothesis property test "
    "(operators/dedup.py:ngram_jaccard_pairs).",
)
def d4_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.sources.readers import read_doc_shingle_set

    docs = read_testdata(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(
        docs, n=2, threshold=0.5,
        shingle_rel=read_doc_shingle_set(spark, sf_dir, 2),
    )


@register(
    "d4_minhash_lsh",
    oracle="""
    WITH tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 1, 1) + 1)) AS i
      FROM tokl),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 1 AS INT)], ' ')
               AS shingle
      FROM idx),
    vocab AS (
      SELECT shingle, row_number() OVER (ORDER BY shingle) - 1 AS tid
      FROM (SELECT DISTINCT shingle FROM sh)),
    tt AS (SELECT doc_id, tid FROM sh JOIN vocab USING (shingle)),
    hp AS (
      SELECT CAST(i AS INT) AS i,
             CAST((i * 2654435761 + 1) % 2147483647 AS BIGINT) AS a,
             CAST((i * 40503 + 7) % 2147483647 AS BIGINT) AS b
      FROM (SELECT unnest(range(16)) AS i)),
    mh AS (
      SELECT doc_id, i, min((a * tid + b) % 2147483647) AS h
      FROM tt CROSS JOIN hp GROUP BY doc_id, i),
    sig AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(CAST(h AS VARCHAR), ',' ORDER BY i) AS s
      FROM mh GROUP BY doc_id, band)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b
      ON a.band = b.band AND a.s = b.s AND a.doc_id < b.doc_id
    """,
    doc="D4: MinHash-LSH near-dup candidates — 16 integer-LCG minhashes "
    "over dense-ranked BIGRAM-shingle ids, 4 bands x 4 rows, bucket join. "
    "Shingles (not unigram token sets) are what make the signatures "
    "discriminative: this corpus has a ~31-word vocabulary, so every doc "
    "contains nearly every token and unigram-set MinHash degenerates to "
    "all-pairs. Integer-exact, so the DuckDB oracle reproduces it "
    "bit-for-bit (operators/dedup.py:minhash_lsh_pairs; at 100 TB swap "
    "dense-rank for xxhash64 — same topology, no global sort).",
)
def d4_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.sources.readers import read_doc_shingle_ids

    docs = read_testdata(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        docs, num_hashes=16, band_size=4, shingle_n=2,
        id_rows=read_doc_shingle_ids(spark, sf_dir, 2),
    )


@register(
    "d4_lsh_pair_recall",
    oracle="""
    WITH tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 1, 1) + 1)) AS i
      FROM tokl),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 1 AS INT)], ' ')
               AS shingle
      FROM idx),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b),
    exact AS (
      SELECT doc_a, doc_b,
             CAST(floor(round(CAST(i AS DOUBLE)
                              / (sa.sz + sb.sz - i), 6) * 1000 + 0.5)
               AS BIGINT) AS jm
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5),
    vocab AS (
      SELECT shingle, row_number() OVER (ORDER BY shingle) - 1 AS tid
      FROM (SELECT DISTINCT shingle FROM sh)),
    tt AS (SELECT doc_id, tid FROM sh JOIN vocab USING (shingle)),
    hp AS (
      SELECT CAST(i AS INT) AS i,
             CAST((i * 2654435761 + 1) % 2147483647 AS BIGINT) AS a,
             CAST((i * 40503 + 7) % 2147483647 AS BIGINT) AS b
      FROM (SELECT unnest(range(16)) AS i)),
    mh AS (
      SELECT doc_id, i, min((a * tid + b) % 2147483647) AS h
      FROM tt CROSS JOIN hp GROUP BY doc_id, i),
    sig AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(CAST(h AS VARCHAR), ',' ORDER BY i) AS s
      FROM mh GROUP BY doc_id, band),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.s = b.s AND a.doc_id < b.doc_id)
    SELECT e.jm // 100 AS j_bucket,
           count(*) AS n_exact,
           CAST(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit
    FROM exact e LEFT JOIN cand c
      ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
    GROUP BY j_bucket
    """,
    doc="D4: MinHash-LSH PAIR RECALL vs exact Jaccard, bucketed by "
    "similarity decile — the empirical S-CURVE every LSH deployment "
    "calibrates its (bands, rows) against, as a driver-checked row "
    "(the dedup-family companion of d4_ann_recall): exact bigram-"
    "Jaccard pairs >= 0.5 (the d4_ngram_jaccard prefix-filtered join) "
    "LEFT JOIN the 4x4-banded candidates (the d4_minhash_lsh "
    "topology), counted per floor-decile of the rounded similarity "
    "(the floor(x*1000+0.5) milli-units convention, so the bucket "
    "edge is the same double both engines floor). On THIS corpus every "
    "exact pair sits in the 0.9+ buckets and recalls fully (the flat "
    "top of the S-curve — disclosed, as for d4_ann_recall's honest "
    "number); the bucket axis exists so a mid-similarity corpus reads "
    "its full curve from the same row, and the engine-side "
    "test_minhash_lsh_recall pins the >=0.9 recall region on planted "
    "near-dups. Any banding or hashing regression moves n_hit and "
    "hash-fails.",
)
def d4_lsh_pair_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.sources.readers import (
        read_doc_shingle_ids,
        read_doc_shingle_set,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    rel = read_doc_shingle_set(spark, sf_dir, 2)
    # ONE dense-rank job feeds BOTH sides (r10 VERDICT task 7): the
    # minhash side needs the oracle's alphabetical dense ids anyway,
    # and the bitmap sweep's (i, u) are set sizes — invariant under
    # any dense id permutation — so the shared relation changes
    # nothing in either output, it just stops the vocabulary being
    # ranked twice from two scans of the shingle relation. The id
    # relation is keyed-persisted, shared with d4_minhash_lsh.
    ids = read_doc_shingle_ids(spark, sf_dir, 2)
    # strategy="bitmap": this corpus is the SMALL-VOCABULARY regime
    # (fewer distinct bigrams than documents) where prefix filtering
    # degenerates to millions of candidates; the dense-bitmap
    # all-pairs sweep is exhaustive, lossless, and ~20x faster here
    # (operators/dedup.py:jaccard_bitmap_allpairs — property-tested
    # equal to the prefix plan)
    # 16x4 tiles: ~2 tiles per local[32] core — tile count is pure
    # parallelism here (the matmul FLOPs are constant); at cluster
    # scale blocks trade replication (q side ships c_blocks copies)
    # against task grain, so the 4x4 default stays for the operator
    exact = D.ngram_jaccard_pairs(
        docs, n=2, threshold=0.5, shingle_rel=rel, strategy="bitmap",
        id_rel=ids, bitmap_blocks=(16, 4),
    ).withColumn(
        "jm",
        F.floor(F.col("jaccard") * 1000 + 0.5).cast("bigint"),
    )
    cand = D.minhash_lsh_pairs(
        docs, num_hashes=16, band_size=4, shingle_n=2, shingle_rel=rel,
        id_rows=ids,
    ).withColumn("hit", F.lit(1))
    return (
        exact.join(cand, ["doc_a", "doc_b"], "left")
        .groupBy(F.expr("jm div 100").alias("j_bucket"))
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint").alias("n_hit"),
        )
    )


@register(
    "d4_minhash_hash",
    oracle=None,  # xxhash64 is engine-specific — rows-only; recall vs the
    # rank-mode pairs is bounded by test_minhash_hash_id_mode_recall
    doc="D4: MinHash-LSH in id_mode='hash' — the PRODUCTION 100 TB path: "
    "shingle ids are pmod(xxhash64(shingle), P), a pure codegen "
    "projection with ZERO coordination (no rank window, no bucket-count "
    "job, no driver state), then the identical 4x4 banding topology. "
    "This is the headline-benchmarked form; the rank-mode twin "
    "(d4_minhash_lsh) keeps the oracle-exact ids "
    "(operators/dedup.py:_doc_token_id_rows id_mode).",
)
def d4_minhash_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.sources.readers import read_doc_shingle_set

    docs = read_testdata(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        docs, num_hashes=16, band_size=4, shingle_n=2, id_mode="hash",
        shingle_rel=read_doc_shingle_set(spark, sf_dir, 2),
    )


@register(
    "d4_ann_ivf_dist",
    oracle=None,  # approximate by construction — recall-bounded in
    # tests; the trainer itself is pinned against a numpy full-corpus
    # reference (test_distributed_kmeans_matches_numpy_full_corpus)
    doc="D4: IVF ANN with the DISTRIBUTED coarse trainer — full-corpus "
    "tree-aggregated spherical Lloyd (one job per iteration: mapInPandas "
    "partial sums per Arrow batch, posexplode + map-side-combined "
    "groupBy, k*(dim+1) doubles to the driver). The 100 TB training form "
    "for corpora whose distribution a bounded sample cannot cover; "
    "same probe/rerank topology as d4_ann_ivf "
    "(operators/similarity.py:_kmeans_distributed). Oracle-exact twin: "
    "d4_ann_ivf_dist_rank (the same trainer topology in pure integer "
    "arithmetic).",
)
def d4_ann_ivf_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb, k=5, n_centroids=16, n_probe=4, train_mode="distributed"
    )


@register(
    "d4_simhash",
    oracle=f"""
    WITH {_TOK},
    hashed AS (
      SELECT doc_id, (tid * 2654435761 + 104729) % 2147483647 AS h FROM tt),
    bits AS (
      SELECT doc_id, j,
             ((h >> CAST(j AS INT)) & 1) * 2 - 1 AS s
      FROM hashed, unnest(range(31)) AS r(j)),
    votes AS (SELECT doc_id, j, sum(s) AS v FROM bits GROUP BY doc_id, j)
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN 1::BIGINT << CAST(j AS INT)
                         ELSE 0 END) AS BIGINT) AS fingerprint
    FROM votes GROUP BY doc_id
    """,
    doc="D4: 31-bit SimHash fingerprints from token-id LCG hashes — "
    "integer-exact (operators/dedup.py:simhash_fingerprints). Pairing by "
    "hamming distance is simhash_pairs (tested in tests/test_dedup.py).",
)
def d4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.sources.readers import read_doc_token_set

    docs = read_testdata(spark, sf_dir, "documents")
    return D.simhash_fingerprints(
        docs, token_rel=read_doc_token_set(spark, sf_dir)
    )


@register(
    "d4_simhash_pairs",
    oracle=f"""
    WITH {_TOK},
    hashed AS (
      SELECT doc_id, (tid * 2654435761 + 104729) % 2147483647 AS h FROM tt),
    bits AS (
      SELECT doc_id, j,
             ((h >> CAST(j AS INT)) & 1) * 2 - 1 AS s
      FROM hashed, unnest(range(31)) AS r(j)),
    votes AS (SELECT doc_id, j, sum(s) AS v FROM bits GROUP BY doc_id, j),
    fps AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN 1::BIGINT << CAST(j AS INT)
                           ELSE 0 END) AS BIGINT) AS fingerprint
      FROM votes GROUP BY doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INT)
             AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 3
    """,
    doc="D4: SimHash near-dup PAIRS (hamming <= 3) via pigeonhole "
    "chunk-blocking (Manku et al. 2007): the 31-bit fingerprint splits "
    "into 4 disjoint chunks, a qualifying pair must agree exactly on one, "
    "candidates come from an equi-join on (chunk_idx, chunk_value), "
    "verify is bit_count(xor) — lossless, no cross join "
    "(operators/dedup.py:hamming_pairs_blocked; equality vs the naive "
    "all-pairs form is property-tested). The oracle computes the same "
    "integer fingerprints and pairs them all-pairs (exact at sf0.01).",
)
def d4_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.sources.readers import read_doc_token_set

    docs = read_testdata(spark, sf_dir, "documents")
    return D.simhash_pairs(
        docs, max_hamming=3, token_rel=read_doc_token_set(spark, sf_dir)
    )


@register(
    "d4_cosine_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                      * sqrt(list_dot_product(c.e, c.e))), 4) AS cos_sim
      FROM v q, v c WHERE q.vec_id <> c.vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM pairs)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    doc="D4: exact cosine top-5 neighbors per vector — crossJoin + builtin "
    "zip_with/aggregate dot product (JVM codegen, no Python). float32 "
    "products are exact in double; similarity rounded to 4 decimals to "
    "absorb addition-order ulps (operators/similarity.py:brute_force_topk).",
)
def d4_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    emb = read_testdata(spark, sf_dir, "embeddings")
    out = S.brute_force_topk(emb, k=5)
    return out.withColumn("rnk", F.col("rnk").cast("bigint"))


@register(
    "d4_embed_neardup",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.e, b.e)
                   / (sqrt(list_dot_product(a.e, a.e))
                      * sqrt(list_dot_product(b.e, b.e))), 4) AS cos_sim
      FROM v a, v b WHERE a.vec_id < b.vec_id)
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.35
    """,
    doc="D4: embedding-cosine near-duplicate pairs (id_a < id_b, rounded "
    "cos >= threshold) — the dedup-by-embedding primitive. Exact broadcast-"
    "matmul verify kernel; at scale the same kernel runs behind an LSH/IVF "
    "candidate generator (operators/similarity.py:cosine_neardup_pairs).",
)
def d4_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    return S.cosine_neardup_pairs(emb, threshold=0.35)


@register(
    "d4_ann_lsh",
    oracle=None,  # approximate by construction; tests measure recall vs
    # brute force (tests/test_similarity.py).
    doc="D4: ANN cosine top-k via random-hyperplane LSH buckets — the "
    "linear-cost scale path; recall vs brute force asserted in tests "
    "(operators/similarity.py:lsh_bucket_topk).",
)
def d4_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    return S.lsh_bucket_topk(emb, k=5)


@register(
    "d4_ann_lsh_rank",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (
      SELECT vec_id, e,
             list_transform(
               e, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS ei
      FROM v),
    pl AS (SELECT unnest(range(8)) AS p),
    proj AS (
      SELECT q.vec_id, pl.p,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(64), d ->
                   (((1103515245 * (pl.p * 64 + d) + 12345) % 2147483647)
                    - 1073741823) * q.ei[CAST(d + 1 AS INT)])),
               (a, x) -> a + x) AS pr
      FROM q CROSS JOIN pl),
    buck AS (
      SELECT vec_id,
             sum(CASE WHEN pr > 0 THEN CAST(1 AS BIGINT) << p
                      ELSE CAST(0 AS BIGINT) END) AS bucket
      FROM proj GROUP BY vec_id),
    bv AS (
      SELECT v.vec_id, v.e, b.bucket
      FROM v JOIN buck b ON v.vec_id = b.vec_id),
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_dot_product(a.e, b.e)
                   / (sqrt(list_dot_product(a.e, a.e))
                      * sqrt(list_dot_product(b.e, b.e))), 4) AS cos_sim
      FROM bv a JOIN bv b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM pairs)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    doc="D4: ANN-LSH's ORACLE-EXACT twin (the d4_minhash_lsh rank-mode "
    "playbook applied to hyperplane LSH): identical bucketing topology "
    "and within-bucket exact rerank as d4_ann_lsh, but the hyperplane "
    "SIGNS are pure integer arithmetic — embeddings quantized to "
    "micros (floor(x*1e6+0.5)), dotted with centered integer-LCG plane "
    "components in BIGINT — so bucket assignment is SQL-stateable "
    "bit-for-bit and the driver verifies the whole LSH pipeline, not "
    "just its recall (operators/similarity.py:lsh_bucket_topk_"
    "exactsign). A double-projection sign would sit one addition-"
    "reorder ulp from a bucket flip; the integer path has no edge at "
    "all. The production entry (d4_ann_lsh) keeps the double "
    "projection and stays rows-only + recall-tested.",
)
def d4_ann_lsh_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    emb = read_testdata(spark, sf_dir, "embeddings")
    out = S.lsh_bucket_topk_exactsign(emb, k=5)
    return out.withColumn("rnk", F.col("rnk").cast("bigint"))


@register(
    "d4_ann_recall",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    exact_pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                      * sqrt(list_dot_product(c.e, c.e))), 4) AS cos_sim
      FROM v q, v c WHERE q.vec_id <> c.vec_id),
    exact_ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM exact_pairs),
    exact5 AS (
      SELECT query_id, neighbor_id FROM exact_ranked WHERE rnk <= 5),
    q AS (
      SELECT vec_id, e,
             list_transform(
               e, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS ei
      FROM v),
    pl AS (SELECT unnest(range(8)) AS p),
    proj AS (
      SELECT q.vec_id, pl.p,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(64), d ->
                   (((1103515245 * (pl.p * 64 + d) + 12345) % 2147483647)
                    - 1073741823) * q.ei[CAST(d + 1 AS INT)])),
               (a, x) -> a + x) AS pr
      FROM q CROSS JOIN pl),
    buck AS (
      SELECT vec_id,
             sum(CASE WHEN pr > 0 THEN CAST(1 AS BIGINT) << p
                      ELSE CAST(0 AS BIGINT) END) AS bucket
      FROM proj GROUP BY vec_id),
    bv AS (
      SELECT v.vec_id, v.e, b.bucket
      FROM v JOIN buck b ON v.vec_id = b.vec_id),
    ann_pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_dot_product(a.e, b.e)
                   / (sqrt(list_dot_product(a.e, a.e))
                      * sqrt(list_dot_product(b.e, b.e))), 4) AS cos_sim
      FROM bv a JOIN bv b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
    ann_ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM ann_pairs),
    ann5 AS (
      SELECT query_id, neighbor_id FROM ann_ranked WHERE rnk <= 5),
    agg AS (
      SELECT e.query_id,
             count(*) AS n_exact,
             sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS n_hit
      FROM exact5 e LEFT JOIN ann5 a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      GROUP BY e.query_id),
    lcnt AS (
      SELECT query_id, count(*) AS n_ann FROM ann5 GROUP BY query_id)
    SELECT g.query_id, CAST(g.n_exact AS BIGINT) AS n_exact,
           CAST(coalesce(c.n_ann, 0) AS BIGINT) AS n_ann,
           CAST(g.n_hit AS BIGINT) AS n_hit
    FROM agg g LEFT JOIN lcnt c ON g.query_id = c.query_id
    """,
    doc="D4: RECALL@5 of the ANN-LSH path vs exact cosine top-5, as "
    "per-query integer overlap counts — the measurement that was "
    "previously only an engine-side test is now driver-checked in "
    "closed form (recall@5 = n_hit / n_exact; integers keep the hash "
    "exact). The ANN side is the exactsign twin's SQL-stateable "
    "topology — the SAME buckets as production d4_ann_lsh (sign "
    "agreement test-pinned), so this row certifies the recall of the "
    "deployed bucketing, closing the last engine-only behavior of the "
    "rows-only ANN family (operators/similarity.py:ann_recall_at_k). "
    "n_ann < 5 marks sparse buckets (singleton queries score 0/5) — "
    "exactly the signal a production ANN dashboard watches. Honest "
    "number: on this fixture mean recall@5 is ~0.04 — the embeddings "
    "are near-uniform random 64-dim vectors (cosines concentrate near "
    "0, neighbors barely closer than non-neighbors), the known worst "
    "case for single-table hyperplane LSH at 8 planes / 256 buckets "
    "over 500 vectors. That is what this row is FOR: it makes the "
    "deployed topology's recall observable (the levers are multi-probe "
    "— lsh_bucket_topk's n_probe_bits — fewer planes, or IVF), rather "
    "than letting 'ANN works' ride on an unmeasured claim. The lever "
    "is SHIPPED: d4_ann_multitable_recall runs the L=8-table topology "
    "on this same fixture and lifts mean recall@5 from ~0.04 to "
    "~0.56, with the candidate-cost curve disclosed there.",
)
def d4_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    return S.ann_recall_at_k(emb, k=5, n_planes=8)


@register(
    "d4_ann_multitable_recall",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    exact_pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                      * sqrt(list_dot_product(c.e, c.e))), 4) AS cos_sim
      FROM v q, v c WHERE q.vec_id <> c.vec_id),
    exact5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM exact_pairs) WHERE rnk <= 5),
    q AS (
      SELECT vec_id,
             list_transform(
               e, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS ei
      FROM v),
    pl AS (SELECT unnest(range(32)) AS j),
    proj AS (
      SELECT q.vec_id, pl.j,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(64), d ->
                   (((1103515245 * (pl.j * 64 + d) + 12345) % 2147483647)
                    - 1073741823) * q.ei[CAST(d + 1 AS INT)])),
               (a, x) -> a + x) AS pr
      FROM q CROSS JOIN pl),
    buck AS (
      SELECT vec_id, j // 4 AS tbl,
             sum(CASE WHEN pr > 0 THEN CAST(1 AS BIGINT) << (j % 4)
                      ELSE CAST(0 AS BIGINT) END) AS bucket
      FROM proj GROUP BY vec_id, j // 4),
    cand AS (
      SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
      FROM buck a JOIN buck b
        ON a.tbl = b.tbl AND a.bucket = b.bucket
       AND a.vec_id <> b.vec_id),
    ann_pairs AS (
      SELECT c.query_id, c.neighbor_id,
             round(list_dot_product(qe.e, ne.e)
                   / (sqrt(list_dot_product(qe.e, qe.e))
                      * sqrt(list_dot_product(ne.e, ne.e))), 4) AS cos_sim
      FROM cand c
      JOIN v qe ON qe.vec_id = c.query_id
      JOIN v ne ON ne.vec_id = c.neighbor_id),
    ann5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM ann_pairs) WHERE rnk <= 5),
    agg AS (
      SELECT e.query_id,
             count(*) AS n_exact,
             sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS n_hit
      FROM exact5 e LEFT JOIN ann5 a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      GROUP BY e.query_id),
    lcnt AS (
      SELECT query_id, count(*) AS n_ann FROM ann5 GROUP BY query_id)
    SELECT g.query_id, CAST(g.n_exact AS BIGINT) AS n_exact,
           CAST(coalesce(c.n_ann, 0) AS BIGINT) AS n_ann,
           CAST(g.n_hit AS BIGINT) AS n_hit
    FROM agg g LEFT JOIN lcnt c ON g.query_id = c.query_id
    """,
    doc="D4: the LSH RECALL LEVER shipped (r10 VERDICT task 2) — "
    "multi-table hyperplane LSH (Gionis/Indyk/Motwani: L independent "
    "tables, a true neighbor only needs to collide in ONE), recall@5 "
    "counters vs exact cosine top-5 in the same closed integer form "
    "as d4_ann_recall. All 32 hyperplanes (L=8 tables x P=4 planes) "
    "come from the SAME centered integer-LCG stream (global plane "
    "index j = t*4 + p, component LCG(j*64+d)); table t's bucket is "
    "the 4-bit sign code over its own planes; candidates = pairs "
    "sharing any table's bucket, DISTINCT before the exact rerank "
    "(operators/similarity.py:lsh_multitable_topk_exactsign). "
    "CALIBRATION on this worst-case near-uniform fixture (500 x 64-d, "
    "cosines concentrated near 0): single-table 8-plane d4_ann_recall "
    "= ~0.04 mean recall@5 at ~2 candidates/query; this topology "
    "(L=8, P=4) = ~0.56 at ~179 candidates/query (~36% of corpus); "
    "the measured curve: (L=8,P=6) 0.33 @ 80/query, (L=16,P=4) 0.73 "
    "@ 249/query. On unstructured data high recall genuinely costs "
    "candidate fan-out — that is the disclosed trade; on clustered "
    "corpora the same topology reaches high recall at a small "
    "fraction (the recall floor rises with any cluster structure, "
    "test-pinned on the clustered fixture). The production double-"
    "projection path takes the same lever via lsh_bucket_topk's "
    "n_probe_bits multi-probe knob.",
)
def d4_ann_multitable_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    ann = S.lsh_multitable_topk_exactsign(
        emb, k=5, n_tables=8, n_planes=4
    ).select("query_id", "neighbor_id")
    return S.recall_vs_exact(emb, ann, k=5)


@register(
    "d4_ann_multiprobe_recall",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    exact_pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                      * sqrt(list_dot_product(c.e, c.e))), 4) AS cos_sim
      FROM v q, v c WHERE q.vec_id <> c.vec_id),
    exact5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM exact_pairs) WHERE rnk <= 5),
    q AS (
      SELECT vec_id,
             list_transform(
               e, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS ei
      FROM v),
    pl AS (SELECT unnest(range(8)) AS p),
    proj AS (
      SELECT q.vec_id, pl.p,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(64), d ->
                   (((1103515245 * (pl.p * 64 + d) + 12345) % 2147483647)
                    - 1073741823) * q.ei[CAST(d + 1 AS INT)])),
               (a, x) -> a + x) AS pr
      FROM q CROSS JOIN pl),
    buck AS (
      SELECT vec_id,
             sum(CASE WHEN pr > 0 THEN CAST(1 AS BIGINT) << p
                      ELSE CAST(0 AS BIGINT) END) AS bucket
      FROM proj GROUP BY vec_id),
    cand AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
      FROM buck a JOIN buck b
        ON a.vec_id <> b.vec_id
       AND bit_count(xor(a.bucket, b.bucket)) <= 1),
    ann_pairs AS (
      SELECT c.query_id, c.neighbor_id,
             round(list_dot_product(qe.e, ne.e)
                   / (sqrt(list_dot_product(qe.e, qe.e))
                      * sqrt(list_dot_product(ne.e, ne.e))), 4) AS cos_sim
      FROM cand c
      JOIN v qe ON qe.vec_id = c.query_id
      JOIN v ne ON ne.vec_id = c.neighbor_id),
    ann5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM ann_pairs) WHERE rnk <= 5),
    agg AS (
      SELECT e.query_id,
             count(*) AS n_exact,
             sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS n_hit
      FROM exact5 e LEFT JOIN ann5 a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      GROUP BY e.query_id),
    lcnt AS (
      SELECT query_id, count(*) AS n_ann FROM ann5 GROUP BY query_id)
    SELECT g.query_id, CAST(g.n_exact AS BIGINT) AS n_exact,
           CAST(coalesce(c.n_ann, 0) AS BIGINT) AS n_ann,
           CAST(g.n_hit AS BIGINT) AS n_hit
    FROM agg g LEFT JOIN lcnt c ON g.query_id = c.query_id
    """,
    doc="D4: the SECOND LSH recall lever measured — MULTI-PROBE (Lv "
    "et al. 2007's idea at hamming radius 1): each query probes its "
    "own bucket plus the 8 buckets one sign-flip away, the identical "
    "8-plane topology as d4_ann_recall so the rows compare directly "
    "(operators/similarity.py:lsh_bucket_topk_exactsign, "
    "n_probe_bits=1). The engine explodes 9 probe buckets per query; "
    "the oracle states the equivalent set declaratively — candidates "
    "are pairs with bit_count(xor(bucket_a, bucket_b)) <= 1 — so the "
    "probed topology is driver-checked bit-for-bit. Measured on this "
    "worst-case near-uniform fixture: recall@5 0.044 (single bucket) "
    "-> 0.149 at ~9/256 of the table probed (~18 candidates/query) — "
    "the CHEAP lever, vs the multi-table entry's 0.56 at ~179 "
    "candidates/query: together the two rows give the recall-per-"
    "candidate curve a deployment tunes against.",
)
def d4_ann_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    ann = S.lsh_bucket_topk_exactsign(
        emb, k=5, n_planes=8, n_probe_bits=1
    ).select("query_id", "neighbor_id")
    return S.recall_vs_exact(emb, ann, k=5)


@register(
    "d4_ann_ivf_recall",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    exact_pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                      * sqrt(list_dot_product(c.e, c.e))), 4) AS cos_sim
      FROM v q, v c WHERE q.vec_id <> c.vec_id),
    exact5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM exact_pairs) WHERE rnk <= 5),
    q AS (
      SELECT vec_id, e,
             list_transform(
               e, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS ei
      FROM v),
    seedrank AS (
      SELECT vec_id,
             row_number() OVER (
               ORDER BY (1103515245 * (vec_id % 2147483647) + 12345) % 2147483647,
                        vec_id) - 1 AS cidx
      FROM v),
    seeds AS (
      SELECT s.cidx, q.ei AS ci
      FROM seedrank s JOIN q ON s.vec_id = q.vec_id
      WHERE s.cidx < 16),
    dots AS (
      SELECT q.vec_id, s.cidx,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(64), d ->
                   q.ei[CAST(d + 1 AS INT)] * s.ci[CAST(d + 1 AS INT)])),
               (a, x) -> a + x) AS idot
      FROM q CROSS JOIN seeds s),
    pr AS (
      SELECT vec_id, cidx,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY idot DESC, cidx) AS prnk
      FROM dots),
    assign AS (SELECT vec_id, cidx AS cluster FROM pr WHERE prnk = 1),
    probes AS (SELECT vec_id, cidx AS cluster FROM pr WHERE prnk <= 4),
    ann_pairs AS (
      SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
             round(list_dot_product(vq.e, vn.e)
                   / (sqrt(list_dot_product(vq.e, vq.e))
                      * sqrt(list_dot_product(vn.e, vn.e))), 4) AS cos_sim
      FROM probes p
      JOIN assign a ON p.cluster = a.cluster AND p.vec_id <> a.vec_id
      JOIN v vq ON vq.vec_id = p.vec_id
      JOIN v vn ON vn.vec_id = a.vec_id),
    ann5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM ann_pairs) WHERE rnk <= 5),
    agg AS (
      SELECT e.query_id,
             count(*) AS n_exact,
             sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS n_hit
      FROM exact5 e LEFT JOIN ann5 a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      GROUP BY e.query_id),
    lcnt AS (
      SELECT query_id, count(*) AS n_ann FROM ann5 GROUP BY query_id)
    SELECT g.query_id, CAST(g.n_exact AS BIGINT) AS n_exact,
           CAST(coalesce(c.n_ann, 0) AS BIGINT) AS n_ann,
           CAST(g.n_hit AS BIGINT) AS n_hit
    FROM agg g LEFT JOIN lcnt c ON g.query_id = c.query_id
    """,
    doc="D4: RECALL@5 of the IVF path vs exact cosine top-5 — "
    "d4_ann_recall's driver-checkable measurement applied to the "
    "second ANN family: the ANN side is the oracle-exact IVF twin's "
    "assign/probe topology (d4_ann_ivf_rank), the exact side the "
    "blocked distributed matmul, joined into per-query integer "
    "counters by the shared recall_vs_exact "
    "(operators/similarity.py). IVF at 4/16 probes recalls far "
    "better than single-table LSH on this near-uniform fixture "
    "(~0.5 vs ~0.04 mean recall@5) because probing a QUARTER of the "
    "corpus bounds how much a bad partition can hide — the exact "
    "comparison a deployment makes when choosing its index, now a "
    "hash-checked row instead of a claim.",
)
def d4_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    ann = S.ivf_topk_exactseed(emb, k=5, n_centroids=16, n_probe=4)
    return S.recall_vs_exact(emb, ann, k=5)


@register(
    "d4_knn_label",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                      * sqrt(list_dot_product(c.e, c.e))), 4) AS cos_sim
      FROM v q, v c WHERE q.vec_id <> c.vec_id),
    exact5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM pairs) WHERE rnk <= 5),
    votes AS (
      SELECT e.query_id, d.lang, count(*) AS n_votes
      FROM exact5 e JOIN documents d ON d.doc_id = e.neighbor_id
      GROUP BY e.query_id, d.lang),
    win AS (
      SELECT query_id, lang, n_votes FROM (
        SELECT query_id, lang, n_votes,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY n_votes DESC, lang) AS rn
        FROM votes) WHERE rn = 1)
    SELECT w.query_id AS doc_id, w.lang AS pred_lang,
           CAST(w.n_votes AS BIGINT) AS n_votes,
           CAST(CASE WHEN w.lang = d.lang THEN 1 ELSE 0 END AS BIGINT)
             AS agrees
    FROM win w JOIN documents d ON d.doc_id = w.query_id
    """,
    doc="D4 (semi-supervised labeling): kNN LABEL PROPAGATION — each "
    "document takes the MAJORITY language label of its 5 exact-cosine "
    "nearest neighbors (ties: more votes win, then lexicographically "
    "smallest label — a total order), with an `agrees` flag against "
    "its own label riding along, so the row doubles as the "
    "label-noise audit a curation pipeline runs before training a "
    "classifier on weak labels. Composition: brute_force_topk's "
    "blocked distributed matmul -> one equi-join to the label table "
    "-> two bounded rank windows (votes are <= 5 rows per query). At "
    "100 TB the exact top-k swaps for the ANN probe exactly as "
    "d4_mmr_ann demonstrates; everything downstream is unchanged. "
    "On the near-uniform fixture agreement hovers near the 5-language "
    "base rate — the honest-measurement convention (see "
    "d4_ann_recall): the row certifies the MACHINERY bit-for-bit, "
    "and on clustered corpora the same plan recovers true labels "
    "(engine test pins >90% agreement on the clustered fixture).",
)
def d4_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    emb = read_testdata(spark, sf_dir, "embeddings")
    docs = read_testdata(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    )
    nn = S.brute_force_topk(emb, k=5).select("query_id", "neighbor_id")
    votes = (
        nn.join(
            docs.select(
                F.col("doc_id").alias("neighbor_id"),
                F.col("lang"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "lang")
        .agg(F.count("*").alias("n_votes"))
    )
    rw = W.partitionBy("query_id").orderBy(F.desc("n_votes"), "lang")
    win = (
        votes.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("lang").alias("pred_lang"), "n_votes")
    )
    return win.join(
        docs.select(F.col("doc_id").alias("query_id"),
                    F.col("lang").alias("true_lang")),
        "query_id",
    ).select(
        F.col("query_id").alias("doc_id"),
        "pred_lang",
        F.col("n_votes").cast("bigint").alias("n_votes"),
        (F.col("pred_lang") == F.col("true_lang"))
        .cast("bigint").alias("agrees"),
    )


@register(
    "d4_dedup_groups",
    oracle="""
    WITH RECURSIVE tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 1, 1) + 1)) AS i
      FROM tokl),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 1 AS INT)], ' ')
               AS shingle
      FROM idx),
    vocab AS (
      SELECT shingle, row_number() OVER (ORDER BY shingle) - 1 AS tid
      FROM (SELECT DISTINCT shingle FROM sh)),
    tt AS (SELECT doc_id, tid FROM sh JOIN vocab USING (shingle)),
    hp AS (
      SELECT CAST(i AS INT) AS i,
             CAST((i * 2654435761 + 1) % 2147483647 AS BIGINT) AS a,
             CAST((i * 40503 + 7) % 2147483647 AS BIGINT) AS b
      FROM (SELECT unnest(range(16)) AS i)),
    mh AS (
      SELECT doc_id, i, min((a * tid + b) % 2147483647) AS h
      FROM tt CROSS JOIN hp GROUP BY doc_id, i),
    sig AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(CAST(h AS VARCHAR), ',' ORDER BY i) AS s
      FROM mh GROUP BY doc_id, band),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.s = b.s AND a.doc_id < b.doc_id),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(id, r) AS (
      SELECT src, src FROM (SELECT DISTINCT src FROM edges)
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)
    SELECT id AS doc_id, min(r) AS group_id FROM reach GROUP BY id
    """,
    doc="D4: dedup GROUPS — connected components over the MinHash-LSH pair "
    "graph via distributed min-label propagation (the step that turns pair "
    "lists into keep/drop decisions; operators/dedup.py:dedup_groups). "
    "Oracle: recursive CTE computing min reachable id. Iterative and "
    "driver-coordinated, but every round is one join + one groupBy; at "
    "extreme scale swap for large-star/small-star.",
)
def d4_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, num_hashes=16, band_size=4, shingle_n=2)
    return D.dedup_groups(pairs)


def _documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-shaped as multimodal rows: content = utf-8 bytes of the
    text (a deterministic stand-in for image/audio/video blobs), media_type
    cycling by doc_id, synthesized dimensions/duration. The BINARY column +
    typed metadata is the storage contract (operators/multimodal.py)."""
    from pyspark.sql import functions as F

    # text bytes ride the exchange here (unlike the id-only fixture
    # feeds) — still the right trade: the downstream decode kernels are
    # per-blob Python, and the corpus is one input split at bench SFs
    docs = _spread_blob_feed(read_testdata(spark, sf_dir, "documents"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        (F.col("doc_id") % 1920 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 1080 + 1).cast("int").alias("height"),
        (F.col("doc_id") % 10 * 1000 + 500).alias("duration_ms"),
    )


@register(
    "d5_media_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents
    """,
    doc="D5 [north-star multimodal]: binary-column decode plumbing — opaque "
    "blobs stream through Arrow-batched mapInPandas, emitting per-blob size, "
    "content hash, and feature vectors (operators/multimodal.py:"
    "decode_features; codec stubbed deterministically, call site marked). "
    "The oracle checks the bytes/hash plumbing exactly; the feature vector "
    "is dropped from the oracled projection (hash-derived stub values).",
)
def d5_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import decode_features

    media = _documents_as_media(spark, sf_dir)
    return decode_features(media).select(
        "media_id", "media_type", "n_bytes", "content_sha"
    )


@register(
    "d5_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id AS media_id, doc_id % 10 * 1000 + 500 AS duration_ms
      FROM documents WHERE CAST(doc_id % 3 AS INT) = 2),
    grid AS (
      SELECT media_id,
             unnest(range(0, greatest(CAST(duration_ms // 1000 AS BIGINT), 1)))
               AS frame_idx
      FROM v)
    SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(frame_idx * 1000 AS INT) AS frame_ts_ms
    FROM grid
    """,
    doc="D5 [north-star multimodal]: video frame-sampling fan-out — one row "
    "per planned frame timestamp via explode(sequence(...)), the real "
    "distributed shape of frame extraction; per-frame decode is the stubbed "
    "step (operators/multimodal.py:frame_sample_plan).",
)
def d5_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.multimodal import frame_sample_plan

    media = _documents_as_media(spark, sf_dir)
    out = frame_sample_plan(media, every_ms=1000)
    return out.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("frame_ts_ms").cast("int").alias("frame_ts_ms"),
    )


@register(
    "d4_ann_ivf",
    oracle=None,  # approximate by construction (probe-limited scan); tests
    # measure recall vs brute force.
    doc="D4: ANN cosine top-k via an IVF coarse quantizer — k-means "
    "centroids trained on a bounded driver sample (broadcast model), "
    "one-pass cluster assignment, n_probe-pruned candidate join, exact "
    "JVM rerank. The inverted-list partition key is the billion-vector "
    "scale path (operators/similarity.py:ivf_topk). Since r17 the "
    "PRODUCTION POSTURE is SELF-ACTING: (n_centroids, n_probe) derive "
    "from corpus size via ivf_posture_for — sqrt sizing while mean "
    "occupancy fits the max_list_len=256 cap, then centroid growth "
    "holding occupancy at cap/2 with doubled probes (the r17 "
    "rehearsal's measured answer to the cap's silent recall price: "
    "uniform list trimming at occupancy ~447 cost recall 0.5611, "
    "probe escalation alone was measured FLAT, and the headroom "
    "posture restored 0.9791 at -33% shuffle and 1.8x less wall than "
    "uncapped — SCALE_REHEARSAL_r17.json). The cap stays as the "
    "imbalance guard bounding per-query candidates at n_probe*256 "
    "regardless of corpus size (the r14 lever against the ~n^1.5 "
    "uncapped probe-shuffle ramp); cap-ACTIVE truncation itself is "
    "oracle-gated by d4_ann_ivf_capped_rank (16 lists, cap 16, "
    "occupancy ~31 at sf0.01 — verifiably truncating). The "
    "oracle-exact twins (d4_ann_ivf_rank / d4_ann_ivf_dist_rank) "
    "stay uncapped — their closed-form oracles state the FULL probe "
    "scan.",
)
def d4_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    nc, npr = S.ivf_posture_for(emb.count())
    return S.ivf_topk(
        emb, k=5, n_centroids=nc, n_probe=npr, max_list_len=256
    )


@register(
    "d4_ann_ivf_rank",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (
      SELECT vec_id, e,
             list_transform(
               e, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS ei
      FROM v),
    seedrank AS (
      SELECT vec_id,
             row_number() OVER (
               ORDER BY (1103515245 * (vec_id % 2147483647) + 12345) % 2147483647,
                        vec_id) - 1 AS cidx
      FROM v),
    seeds AS (
      SELECT s.cidx, q.ei AS ci
      FROM seedrank s JOIN q ON s.vec_id = q.vec_id
      WHERE s.cidx < 16),
    dots AS (
      SELECT q.vec_id, s.cidx,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(64), d ->
                   q.ei[CAST(d + 1 AS INT)] * s.ci[CAST(d + 1 AS INT)])),
               (a, x) -> a + x) AS idot
      FROM q CROSS JOIN seeds s),
    pr AS (
      SELECT vec_id, cidx,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY idot DESC, cidx) AS prnk
      FROM dots),
    assign AS (SELECT vec_id, cidx AS cluster FROM pr WHERE prnk = 1),
    probes AS (SELECT vec_id, cidx AS cluster FROM pr WHERE prnk <= 4),
    pairs AS (
      SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
             round(list_dot_product(vq.e, vn.e)
                   / (sqrt(list_dot_product(vq.e, vq.e))
                      * sqrt(list_dot_product(vn.e, vn.e))), 4) AS cos_sim
      FROM probes p
      JOIN assign a ON p.cluster = a.cluster AND p.vec_id <> a.vec_id
      JOIN v vq ON vq.vec_id = p.vec_id
      JOIN v vn ON vn.vec_id = a.vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM pairs)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    doc="D4: IVF's ORACLE-EXACT twin (the d4_ann_lsh_rank playbook "
    "applied to IVF): identical assign -> probe -> pruned-join -> exact-"
    "rerank topology as d4_ann_ivf, but centroids are the 16 corpus "
    "vectors with the smallest (integer-LCG(id), id) — no Lloyd "
    "iterations — and list assignment is the exact BIGINT dot of micros-"
    "quantized vectors, so every list membership is SQL-stateable "
    "bit-for-bit and the driver verifies the IVF structure end-to-end "
    "(operators/similarity.py:ivf_topk_exactseed). The production entry "
    "(d4_ann_ivf) keeps the Lloyd-trained double centroids and stays "
    "rows-only + recall-tested.",
)
def d4_ann_ivf_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    emb = read_testdata(spark, sf_dir, "embeddings")
    out = S.ivf_topk_exactseed(emb, k=5, n_centroids=16, n_probe=4)
    return out.withColumn("rnk", F.col("rnk").cast("bigint"))


@register(
    "d4_ann_ivf_capped_rank",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (
      SELECT vec_id, e,
             list_transform(
               e, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS ei
      FROM v),
    seedrank AS (
      SELECT vec_id,
             row_number() OVER (
               ORDER BY (1103515245 * (vec_id % 2147483647) + 12345) % 2147483647,
                        vec_id) - 1 AS cidx
      FROM v),
    seeds AS (
      SELECT s.cidx, q.ei AS ci
      FROM seedrank s JOIN q ON s.vec_id = q.vec_id
      WHERE s.cidx < 16),
    dots AS (
      SELECT q.vec_id, s.cidx,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(64), d ->
                   q.ei[CAST(d + 1 AS INT)] * s.ci[CAST(d + 1 AS INT)])),
               (a, x) -> a + x) AS idot
      FROM q CROSS JOIN seeds s),
    pr AS (
      SELECT vec_id, cidx,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY idot DESC, cidx) AS prnk
      FROM dots),
    assign AS (SELECT vec_id, cidx AS cluster FROM pr WHERE prnk = 1),
    -- the production cap in closed form: keep each inverted list's 16
    -- members with the smallest (LCG(id), id) — the same deterministic
    -- uniform-subsample rule ivf_topk applies with xxhash64
    capped AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (
                 PARTITION BY cluster
                 ORDER BY (1103515245 * (vec_id % 2147483647) + 12345)
                            % 2147483647,
                          vec_id) AS lr
        FROM assign) t
      WHERE lr <= 16),
    probes AS (SELECT vec_id, cidx AS cluster FROM pr WHERE prnk <= 4),
    pairs AS (
      SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
             round(list_dot_product(vq.e, vn.e)
                   / (sqrt(list_dot_product(vq.e, vq.e))
                      * sqrt(list_dot_product(vn.e, vn.e))), 4) AS cos_sim
      FROM probes p
      JOIN capped a ON p.cluster = a.cluster AND p.vec_id <> a.vec_id
      JOIN v vq ON vq.vec_id = p.vec_id
      JOIN v vn ON vn.vec_id = a.vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM pairs)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    doc="D4 (r16 VERDICT task 1): the CAPPED production posture of IVF "
    "under an oracle-exact driver row. d4_ann_ivf has run "
    "max_list_len=256 since r15, but its Lloyd-trained centroids make "
    "it rows-only by construction and its oracle-exact twins stated "
    "the UNCAPPED probe scan — so the one lever the r14 scale "
    "rehearsal showed 100 TB requires (capping sqrt(n)-sized lists to "
    "bound the ~n^1.5 probe shuffle) had no hash-verified row. This "
    "entry is d4_ann_ivf_rank with max_list_len=16: inverted lists "
    "are truncated to their 16 members with the smallest "
    "(lcg_pick(id), id) — ivf_topk's smallest-xxhash64 uniform "
    "subsample restated in the engine's integer LCG so the truncated "
    "candidate SET is SQL-stateable bit-for-bit "
    "(operators/similarity.py:_int_probe_rerank). The cap is ACTIVE "
    "at the driver's sf0.01 (500 vectors / 16 lists, mean occupancy "
    "~31 > 16; asserted with planted occupancy in "
    "test_ivf_exactseed_cap_matches_reference), so the driver "
    "verifies the capped candidate set itself, not a no-op flag.",
)
def d4_ann_ivf_capped_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    emb = read_testdata(spark, sf_dir, "embeddings")
    out = S.ivf_topk_exactseed(
        emb, k=5, n_centroids=16, n_probe=4, max_list_len=16
    )
    return out.withColumn("rnk", F.col("rnk").cast("bigint"))


@register(
    "d4_ann_ivf_dist_rank",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (
      SELECT vec_id, e,
             list_transform(
               e, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS ei
      FROM v),
    seedrank AS (
      SELECT vec_id,
             row_number() OVER (
               ORDER BY (1103515245 * (vec_id % 2147483647) + 12345) % 2147483647,
                        vec_id) - 1 AS cidx
      FROM v),
    seeds AS (
      SELECT s.cidx, q.ei AS ci
      FROM seedrank s JOIN q ON s.vec_id = q.vec_id
      WHERE s.cidx < 16),
    dims AS (SELECT unnest(range(64)) AS d),
    cent0 AS (
      SELECT s.cidx AS cluster, dims.d AS d,
             s.ci[CAST(dims.d + 1 AS INT)] AS c
      FROM seeds s CROSS JOIN dims),
    dots0 AS (
      SELECT q.vec_id, c0.cluster AS cidx,
             sum(q.ei[CAST(c0.d + 1 AS INT)] * c0.c) AS idot
      FROM q CROSS JOIN cent0 c0
      GROUP BY q.vec_id, c0.cluster),
    a0 AS (
      SELECT vec_id, cidx AS cluster FROM (
        SELECT vec_id, cidx,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY idot DESC, cidx) AS rn
        FROM dots0)
      WHERE rn = 1),
    comp0 AS (
      SELECT a0.cluster, dims.d AS d,
             sum(q.ei[CAST(dims.d + 1 AS INT)]) AS s, count(*) AS n
      FROM a0 JOIN q ON q.vec_id = a0.vec_id CROSS JOIN dims
      GROUP BY a0.cluster, dims.d),
    cent1 AS (
      SELECT c0.cluster, c0.d,
             coalesce(CAST((t.s - ((t.s % t.n) + t.n) % t.n) // t.n
                           AS BIGINT), c0.c) AS c
      FROM cent0 c0
      LEFT JOIN comp0 t ON t.cluster = c0.cluster AND t.d = c0.d),
    dots1 AS (
      SELECT q.vec_id, c1.cluster AS cidx,
             sum(q.ei[CAST(c1.d + 1 AS INT)] * c1.c) AS idot
      FROM q CROSS JOIN cent1 c1
      GROUP BY q.vec_id, c1.cluster),
    a1 AS (
      SELECT vec_id, cidx AS cluster FROM (
        SELECT vec_id, cidx,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY idot DESC, cidx) AS rn
        FROM dots1)
      WHERE rn = 1),
    comp1 AS (
      SELECT a1.cluster, dims.d AS d,
             sum(q.ei[CAST(dims.d + 1 AS INT)]) AS s, count(*) AS n
      FROM a1 JOIN q ON q.vec_id = a1.vec_id CROSS JOIN dims
      GROUP BY a1.cluster, dims.d),
    cent2 AS (
      SELECT c1.cluster, c1.d,
             coalesce(CAST((t.s - ((t.s % t.n) + t.n) % t.n) // t.n
                           AS BIGINT), c1.c) AS c
      FROM cent1 c1
      LEFT JOIN comp1 t ON t.cluster = c1.cluster AND t.d = c1.d),
    dots2 AS (
      SELECT q.vec_id, c2.cluster AS cidx,
             sum(q.ei[CAST(c2.d + 1 AS INT)] * c2.c) AS idot
      FROM q CROSS JOIN cent2 c2
      GROUP BY q.vec_id, c2.cluster),
    pr AS (
      SELECT vec_id, cidx,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY idot DESC, cidx) AS prnk
      FROM dots2),
    assign AS (SELECT vec_id, cidx AS cluster FROM pr WHERE prnk = 1),
    probes AS (SELECT vec_id, cidx AS cluster FROM pr WHERE prnk <= 4),
    pairs AS (
      SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
             round(list_dot_product(vq.e, vn.e)
                   / (sqrt(list_dot_product(vq.e, vq.e))
                      * sqrt(list_dot_product(vn.e, vn.e))), 4) AS cos_sim
      FROM probes p
      JOIN assign a ON p.cluster = a.cluster AND p.vec_id <> a.vec_id
      JOIN v vq ON vq.vec_id = p.vec_id
      JOIN v vn ON vn.vec_id = a.vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM pairs)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    doc="D4: the DISTRIBUTED IVF trainer's ORACLE-EXACT twin — TWO "
    "chained full-corpus Lloyd iterations in pure integer arithmetic "
    "(operators/similarity.py:ivf_topk_distexact; the g1/g3/BPE "
    "unrolled-iteration playbook, so iteration 2's assignment reads "
    "iteration 1's trained centroids and the oracle must state the "
    "whole loop): LCG seeds, exact BIGINT-dot assignment, centroid "
    "update as the floored integer mean of member micros via "
    "posexplode + map-side-combined groupBy — the tree-aggregated "
    "partial-sum topology of _kmeans_distributed with ZERO driver "
    "collects (each iteration's trained model stays a DataFrame and "
    "is broadcast into the next). Integer sums are associative, so "
    "the trained centroids — and therefore every list membership — "
    "are partition-order independent and SQL-stateable bit-for-bit; "
    "empty lists carry the previous iteration's centroid. The "
    "production entry (d4_ann_ivf_dist) keeps the float tree-"
    "aggregated Lloyd and stays rows-only + recall-tested.",
)
def d4_ann_ivf_dist_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    emb = read_testdata(spark, sf_dir, "embeddings")
    out = S.ivf_topk_distexact(emb, k=5, n_centroids=16, n_probe=4)
    return out.withColumn("rnk", F.col("rnk").cast("bigint"))


@register(
    "d4_ann_pq",
    oracle=None,  # approximate by construction (coarse pruning +
    # quantization); tests measure recall and the rerank recovery.
    doc="D4: ANN cosine top-k via IVF-PQ (Jegou et al. 2011) — vectors "
    "stored as m product-quantizer codes (bytes, not floats: the "
    "billion-vector memory path), similarity approximated by ADC table "
    "lookups inside codegen (no vector math in the pair path), plus the "
    "FAISS-style exact-rerank refine of the shortlist "
    "(operators/similarity.py:pq_topk).",
)
def d4_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    return S.pq_topk(emb, k=5, rerank_factor=4)


@register(
    "d4_ann_pq_rank",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (
      SELECT vec_id,
             list_transform(
               e, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS ei
      FROM v),
    seedrank AS (
      SELECT vec_id,
             row_number() OVER (
               ORDER BY (1103515245 * (vec_id % 2147483647) + 12345) % 2147483647,
                        vec_id) - 1 AS cidx
      FROM v),
    seeds AS (
      SELECT s.cidx, q.ei AS ci
      FROM seedrank s JOIN q ON s.vec_id = q.vec_id
      WHERE s.cidx < 16),
    dots AS (
      SELECT q.vec_id, s.cidx,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(64), d ->
                   q.ei[CAST(d + 1 AS INT)] * s.ci[CAST(d + 1 AS INT)])),
               (a, x) -> a + x) AS idot
      FROM q CROSS JOIN seeds s),
    pr AS (
      SELECT vec_id, cidx,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY idot DESC, cidx) AS prnk
      FROM dots),
    assign AS (SELECT vec_id, cidx AS cluster FROM pr WHERE prnk = 1),
    probes AS (SELECT vec_id, cidx AS cluster FROM pr WHERE prnk <= 4),
    subd AS (
      SELECT q.vec_id, s.cidx AS code, CAST(jj.j AS BIGINT) AS j,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(16), d ->
                   (q.ei[CAST(jj.j * 16 + d + 1 AS INT)]
                    - s.ci[CAST(jj.j * 16 + d + 1 AS INT)])
                   * (q.ei[CAST(jj.j * 16 + d + 1 AS INT)]
                      - s.ci[CAST(jj.j * 16 + d + 1 AS INT)]))),
               (a, x) -> a + x) AS d2
      FROM q CROSS JOIN seeds s
      CROSS JOIN (SELECT unnest(range(4)) AS j) jj),
    ncode AS (
      SELECT vec_id, j, code FROM (
        SELECT vec_id, j, code,
               row_number() OVER (PARTITION BY vec_id, j
                                  ORDER BY d2, code) AS rn
        FROM subd)
      WHERE rn = 1),
    pairs AS (
      SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
      FROM probes p
      JOIN assign a ON p.cluster = a.cluster AND p.vec_id <> a.vec_id),
    adc AS (
      SELECT pp.query_id, pp.neighbor_id,
             CAST(sum(qd.d2) AS BIGINT) AS adc_d2
      FROM pairs pp
      JOIN ncode nc ON nc.vec_id = pp.neighbor_id
      JOIN subd qd ON qd.vec_id = pp.query_id
                  AND qd.j = nc.j AND qd.code = nc.code
      GROUP BY pp.query_id, pp.neighbor_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY adc_d2, neighbor_id) AS rnk
      FROM adc)
    SELECT query_id, neighbor_id, adc_d2, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    doc="D4: IVF-PQ's ORACLE-EXACT twin — the coarse-probe -> PQ-encode "
    "-> ADC-score -> rank topology of d4_ann_pq restated in PURE "
    "INTEGER arithmetic (operators/similarity.py:pq_topk_exactseed): "
    "one LCG seed set serves as both coarse centroids and per-subspace "
    "codebooks, codes are exact BIGINT squared-L2 argmins, and the "
    "pair score is the integer ADC sum over the candidate's codewords "
    "— the candidate's raw vector is never touched in the pair path, "
    "exactly the PQ memory contract, and no float exists anywhere in "
    "the output. The production entry (d4_ann_pq) keeps Lloyd-trained "
    "double codebooks + in-batch ADC arrays and stays rows-only + "
    "recall-tested.",
)
def d4_ann_pq_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    return S.pq_topk_exactseed(emb, k=5)


@register(
    "d4_token_stats",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS n_tokens,
           length(text) AS n_chars_text,
           CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
             / length(text) AS space_ratio,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS mean_token_len
    FROM documents
    """,
    doc="D4: per-doc token statistics (token count, char count, whitespace "
    "ratio, mean token length) — quality-scoring raw features "
    "(operators/text.py:token_stats).",
)
def d4_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.token_stats(read_testdata(spark, sf_dir, "documents"))


@register(
    "d4_bpe_tokens",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]{1,3}|[0-9]+|[^a-zA-Z0-9 ]'))
             AS n_subwords,
           len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS n_words,
           round(CAST(len(regexp_extract_all(text,
                 '[a-zA-Z]{1,3}|[0-9]+|[^a-zA-Z0-9 ]')) AS DOUBLE)
                 / len(list_filter(string_split(text, ' '), x -> x <> '')), 6)
             AS subword_ratio
    FROM documents
    """,
    doc="D4: BPE-ish subword token counting — one regexp_extract_all pass "
    "(letter chunks / digit runs / symbols), approximating LLM token "
    "budgets next to the whitespace counts (operators/text.py:"
    "bpe_token_count). Pure-ASCII pattern so Java regex and RE2 agree.",
)
def d4_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.bpe_token_count(read_testdata(spark, sf_dir, "documents"))


@register(
    "d4_bpe_pair_counts",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        AS token
      FROM documents),
    tc AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    p AS (
      SELECT substr(token, CAST(i AS INT), 2) AS pair, cnt
      FROM tc, UNNEST(range(1, len(token))) AS t(i))
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 50
    """,
    doc="D4 (tokenizer training): the first BPE merge-learning iteration "
    "— corpus-weighted adjacent character-pair frequencies, top 50 "
    "(the pair a BPE trainer would merge first is row one). The scale "
    "trick is aggregating over the DISTINCT-token vocabulary weighted "
    "by token counts instead of exploding pairs per occurrence: the "
    "pair explode runs over vocabulary-sized input (bounded) while the "
    "corpus-sized work is one map-side-combined token count — at "
    "100 TB that's the difference between exploding ~10^13 token "
    "occurrences and ~10^6 vocabulary entries. Deterministic "
    "(n DESC, pair) tie-break; TakeOrderedAndProject keeps the top-50 "
    "local.",
)
def d4_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = read_testdata(spark, sf_dir, "documents")
    tc = (
        D.tokens(docs, distinct=False)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    idx = F.when(
        F.length("token") >= 2,
        F.sequence(F.lit(1), F.length("token") - 1),
    ).otherwise(F.array().cast("array<int>"))
    pairs = tc.select(
        F.explode(
            F.transform(idx, lambda i: F.col("token").substr(i, F.lit(2)))
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(50)
    )


def _bpe_pair_block(i: int, src_cte: str, carry_token: bool) -> str:
    """One BPE step's pair-count CTE p{i} over the symbol strings of
    `src_cte` — shared by the programmatic merge/encode oracle
    generators (the hand-unrolled k=3 chain this replaced could not
    follow the entries to k=5)."""
    tok = "token, " if carry_token else ""
    return f"""    p{i} AS (
      SELECT syms[CAST(i AS INT)] AS pa, syms[CAST(i + 1 AS INT)] AS pb,
             CAST(sum(cnt) AS BIGINT) AS n
      FROM (SELECT {tok}list_filter(string_split(s, ' '), x -> x <> '')
                   AS syms, cnt
            FROM {src_cte}) t,
           UNNEST(range(1, len(syms))) AS r(i)
      GROUP BY pa, pb)"""


def _bpe_merge_block(i: int, carry_token: bool) -> str:
    """One BPE step's winner + recursive first-occurrence merge CTEs
    (b{i}, m{i}, t{i}). The winner is coalesced to the two-space
    sentinel (never occurs in a single-space-joined symbol string), so
    an EMPTY winner makes the merge a no-op instead of annihilating
    the vocabulary — the engines' left-join-on-TRUE guard, stated in
    SQL."""
    tok = "token, " if carry_token else ""
    return f"""    b{i} AS (
      SELECT coalesce(min(pat), '  ') AS pat, coalesce(min(rep), '  ')
               AS rep
      FROM (SELECT ' ' || pa || ' ' || pb || ' ' AS pat,
                   ' ' || pa || pb || ' ' AS rep
            FROM p{i} ORDER BY n DESC, pa, pb LIMIT 1)),
    m{i} AS (
      SELECT {tok}s, cnt FROM t{i - 1}
      UNION ALL
      SELECT {tok}substr(s, 1, strpos(s, pat) - 1) || rep
               || substr(s, strpos(s, pat) + length(pat)), cnt
      FROM m{i}, b{i} WHERE strpos(s, pat) > 0),
    t{i} AS (SELECT {tok}s, cnt FROM m{i}, b{i} WHERE strpos(s, pat) = 0)"""


def _bpe_merge_oracle(n_steps: int, top_k: int) -> str:
    """The d4_bpe_merge_steps oracle for any chain length: top-`top_k`
    pairs before each of `n_steps` merges plus the post-merge counts
    as step n_steps+1 — generated, so the SQL provably has one block
    per step instead of a hand-copied unroll."""
    parts = ["""    WITH RECURSIVE tok AS (
      SELECT token, count(*) AS cnt FROM (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          AS token
        FROM documents)
      GROUP BY token),
    t0 AS (
      SELECT ' ' || array_to_string(string_split(token, ''), ' ') || ' '
               AS s, cnt
      FROM tok)"""]
    for i in range(1, n_steps + 1):
        parts.append(_bpe_pair_block(i, f"t{i - 1}", carry_token=False))
        parts.append(_bpe_merge_block(i, carry_token=False))
    parts.append(
        _bpe_pair_block(n_steps + 1, f"t{n_steps}", carry_token=False)
    )
    ranked = "\n      UNION ALL\n".join(
        f"""      SELECT CAST({i} AS BIGINT) AS step, pa, pb, n,
             row_number() OVER (ORDER BY n DESC, pa, pb) AS rnk FROM p{i}"""
        for i in range(1, n_steps + 2)
    )
    parts.append(f"    ranked AS (\n{ranked})")
    body = ",\n".join(parts)
    return (
        f"{body}\n    SELECT step, pa, pb, n, CAST(rnk AS BIGINT) AS rnk"
        f"\n    FROM ranked WHERE rnk <= {top_k}\n    "
    )


def _bpe_encode_oracle(n_steps: int) -> str:
    """The d4_bpe_encode oracle for any chain length: the merge chain
    carrying the original token, then the per-document budget join —
    including the encode-then-detokenize conservation count
    (replace(s, ' ', '') <> token), derived through the oracle's OWN
    chain so an engine-side fold corruption hash-fails."""
    parts = ["""    WITH RECURSIVE tok AS (
      SELECT token, count(*) AS cnt FROM (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          AS token
        FROM documents)
      GROUP BY token),
    t0 AS (
      SELECT token,
             ' ' || array_to_string(string_split(token, ''), ' ') || ' '
               AS s, cnt
      FROM tok)"""]
    for i in range(1, n_steps + 1):
        parts.append(_bpe_pair_block(i, f"t{i - 1}", carry_token=True))
        parts.append(_bpe_merge_block(i, carry_token=True))
    parts.append(f"""    enc AS (
      SELECT token,
             CAST(len(list_filter(string_split(s, ' '), x -> x <> ''))
               AS BIGINT) AS n_sym,
             CASE WHEN replace(s, ' ', '') <> token THEN 1 ELSE 0 END
               AS bad
      FROM t{n_steps}),
    d AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS token
      FROM documents)""")
    body = ",\n".join(parts)
    return f"""{body}
    SELECT doc_id,
           count(*) AS n_words,
           CAST(sum(length(token)) AS BIGINT) AS n_chars,
           CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
           CAST((sum(length(token)) - sum(n_sym)) * 10000
                // sum(length(token)) AS BIGINT) AS saved_bp,
           CAST(sum(bad) AS BIGINT) AS n_decode_errors
    FROM d JOIN enc USING (token)
    GROUP BY doc_id
    """


@register(
    "d4_bpe_merge_steps",
    oracle=_bpe_merge_oracle(5, 5),
    doc="D4 (tokenizer training, CHAINED): FIVE true BPE merge "
    "iterations where step k's pair counts provably reflect step k-1's "
    "merge — the d4_bpe_pair_counts loop unrolled the way g1/g3 unroll "
    "their iterations so the oracle can state every step. Engine side "
    "(operators/text.py:bpe_merge_steps): vocabulary-weighted pair "
    "counts, one-row broadcast winner, and the merge as a left-fold "
    "over each token's symbol array inside F.aggregate — greedy "
    "left-to-right, pure JVM expression. Oracle side: the same greedy "
    "merge as a recursive CTE replacing the FIRST occurrence per "
    "recursion (restart-from-start == continue-after-match here, "
    "because a merged symbol pa||pb can never equal pa or pb and so "
    "never forms a new occurrence backward or forward). The oracle "
    "chain is GENERATED per step (_bpe_merge_oracle), so the entry "
    "follows its n_steps parameter instead of a hand-copied unroll; "
    "an empty winner is a no-op on both engines (left-join guard / "
    "two-space sentinel). Output: top-5 pairs before each merge "
    "(rnk 1 = the merged pair) plus the post-merge counts as step 6.",
)
def d4_bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.bpe_merge_steps(
        read_testdata(spark, sf_dir, "documents"), n_steps=5, k=5
    )


@register(
    "d4_bpe_encode",
    oracle=_bpe_encode_oracle(5),
    doc="D4 (tokenizer APPLICATION, chained on training): learn 5 BPE "
    "merges on the corpus (identical training chain to "
    "d4_bpe_merge_steps — same winners, same greedy fold), then ENCODE "
    "every document with them: per-doc whitespace-token count, "
    "pre-merge symbol count, post-merge BPE token count, and the "
    "compression in exact basis points (true integer division — at "
    "100 TB the numerator exceeds 2^53, so floor-of-double would not "
    "be exact). Scale trick: train AND encode on the "
    "distinct-token vocabulary; the only corpus-sized ops are the "
    "map-side-combined token count and one hash join of occurrences "
    "against the encoded vocab (operators/text.py:bpe_encode). Oracle: "
    "the merge_steps recursive-CTE chain (generated per step) carrying "
    "the original token through every merge, then the same "
    "join+aggregate — plus the encode-then-detokenize CONSERVATION "
    "count n_decode_errors (concat of a token's encoded symbols must "
    "reproduce the token; each engine derives its zero through its own "
    "chain, so a fold that drops or duplicates characters hash-fails).",
)
def d4_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.bpe_encode(
        read_testdata(spark, sf_dir, "documents"), n_steps=5
    )


@register(
    "d4_mmr_diversify",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(
               CAST(embedding AS DOUBLE[]),
               x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS ei
      FROM embeddings),
    q AS (
      SELECT vec_id AS qid, ei AS qi FROM v
      ORDER BY (1103515245 * (vec_id % 2147483647) + 12345) % 2147483647,
               vec_id
      LIMIT 1),
    dims AS (SELECT unnest(range(64)) AS d),
    rel AS (
      SELECT v.vec_id AS id,
             sum(v.ei[CAST(dims.d + 1 AS INT)]
                 * q.qi[CAST(dims.d + 1 AS INT)]) AS rel
      FROM v CROSS JOIN q CROSS JOIN dims
      WHERE v.vec_id <> q.qid
      GROUP BY v.vec_id),
    cand AS (SELECT id, rel FROM rel ORDER BY rel DESC, id LIMIT 16),
    pd AS (
      SELECT a.id AS ia, b.id AS ib,
             sum(va.ei[CAST(dims.d + 1 AS INT)]
                 * vb.ei[CAST(dims.d + 1 AS INT)]) AS pdot
      FROM cand a JOIN cand b ON a.id <> b.id
      JOIN v va ON va.vec_id = a.id
      JOIN v vb ON vb.vec_id = b.id
      CROSS JOIN dims
      GROUP BY a.id, b.id),
    s1 AS (SELECT id, rel FROM cand ORDER BY rel DESC, id LIMIT 1),
    c2 AS (
      SELECT c.id, c.rel, c.rel - pd.pdot AS mmr2
      FROM cand c, s1, pd
      WHERE c.id <> s1.id AND pd.ia = c.id AND pd.ib = s1.id),
    s2 AS (SELECT id, rel, mmr2 FROM c2 ORDER BY mmr2 DESC, id LIMIT 1),
    c3 AS (
      SELECT c.id, c.rel, c.rel - max(pd.pdot) AS mmr2
      FROM cand c, s1, s2, pd
      WHERE c.id <> s1.id AND c.id <> s2.id
        AND pd.ia = c.id AND (pd.ib = s1.id OR pd.ib = s2.id)
      GROUP BY c.id, c.rel),
    s3 AS (SELECT id, rel, mmr2 FROM c3 ORDER BY mmr2 DESC, id LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS rnk, id AS neighbor_id,
           CAST(rel AS BIGINT) AS rel_dot, CAST(rel AS BIGINT) AS mmr2
    FROM s1
    UNION ALL
    SELECT CAST(2 AS BIGINT), id, CAST(rel AS BIGINT),
           CAST(mmr2 AS BIGINT) FROM s2
    UNION ALL
    SELECT CAST(3 AS BIGINT), id, CAST(rel AS BIGINT),
           CAST(mmr2 AS BIGINT) FROM s3
    """,
    doc="D4 (retrieval diversification): Maximal Marginal Relevance "
    "re-ranking — the post-ANN step that picks k results relevant to "
    "the query but not redundant with each other (lambda = 1/2, "
    "objective kept at 2x so it stays integer). The greedy chain is "
    "UNROLLED into the plan (operators/similarity.py:"
    "mmr_topk_exactseed): LCG-picked query, top-16 candidates by exact "
    "BIGINT micros dot (TakeOrderedAndProject), bounded 16^2 pair-dot "
    "table, each pick a one-row broadcast feeding the next step's "
    "redundancy max — zero collects, zero driver loop state. Oracle "
    "states the same three picks as chained CTEs. Ties break on the "
    "smaller id at every step on both engines.",
)
def d4_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    return S.mmr_topk_exactseed(emb, k=3, n_cand=16)


@register(
    "d4_fuzzy_key_pairs",
    oracle="""
    WITH v AS (SELECT DISTINCT c_name AS t FROM customer),
    var AS (
      SELECT t, t AS v FROM v
      UNION ALL
      SELECT t, substr(t, 1, CAST(i AS INT) - 1)
                || substr(t, CAST(i AS INT) + 1) AS v
      FROM v, UNNEST(range(1, length(t) + 1)) r(i)),
    cand AS (
      SELECT DISTINCT a.t AS key_a, b.t AS key_b
      FROM var a JOIN var b ON a.v = b.v AND a.t < b.t)
    SELECT key_a, key_b FROM cand WHERE levenshtein(key_a, key_b) = 1
    """,
    doc="D4 (fuzzy key matching / entity resolution): every pair of "
    "customer identifiers at edit distance exactly 1 — the one-keystroke "
    "near-collision audit — via SymSpell deletion-neighborhood blocking "
    "(operators/dedup.py:edit1_pairs): block on each key's one-char "
    "deletions plus itself, equi-join on the variant, verify with "
    "levenshtein()==1. Never all-pairs: candidate cost is the sum of "
    "block occupancies (a block holds only the keys differing at one "
    "position), where the naive join is quadratic in the vocabulary — "
    "at 100 TB the difference between joining deletion buckets and "
    "10^13 squared. Completeness for lev<=1 is argued in the operator "
    "docstring and PROVED lossless against the naive quadratic join by "
    "a hypothesis property test; the oracle states the identical "
    "blocking relationally (both engines' levenshtein is unit edit "
    "distance).",
)
def d4_fuzzy_key_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer")
    return D.edit1_pairs(cust, key_col="c_name")


@register(
    "d4_mmr_batch",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(
               CAST(embedding AS DOUBLE[]),
               x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS ei
      FROM embeddings),
    qs AS (
      SELECT vec_id AS qid, ei AS qi FROM v
      ORDER BY (1103515245 * (vec_id % 2147483647) + 12345) % 2147483647,
               vec_id
      LIMIT 3),
    dims AS (SELECT unnest(range(64)) AS d),
    rel AS (
      SELECT qs.qid, v.vec_id AS id,
             sum(v.ei[CAST(dims.d + 1 AS INT)]
                 * qs.qi[CAST(dims.d + 1 AS INT)]) AS rel
      FROM v CROSS JOIN qs CROSS JOIN dims
      WHERE v.vec_id <> qs.qid
      GROUP BY qs.qid, v.vec_id),
    cand AS (
      SELECT qid, id, rel FROM (
        SELECT qid, id, rel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY rel DESC, id) AS crnk
        FROM rel)
      WHERE crnk <= 16),
    pd AS (
      SELECT a.qid, a.id AS ia, b.id AS ib,
             sum(va.ei[CAST(dims.d + 1 AS INT)]
                 * vb.ei[CAST(dims.d + 1 AS INT)]) AS pdot
      FROM cand a JOIN cand b ON a.qid = b.qid AND a.id <> b.id
      JOIN v va ON va.vec_id = a.id
      JOIN v vb ON vb.vec_id = b.id
      CROSS JOIN dims
      GROUP BY a.qid, a.id, b.id),
    s1 AS (
      SELECT qid, id, rel FROM (
        SELECT qid, id, rel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY rel DESC, id) AS rn
        FROM cand) WHERE rn = 1),
    c2 AS (
      SELECT c.qid, c.id, c.rel, c.rel - pd.pdot AS mmr2
      FROM cand c
      JOIN s1 ON s1.qid = c.qid AND c.id <> s1.id
      JOIN pd ON pd.qid = c.qid AND pd.ia = c.id AND pd.ib = s1.id),
    s2 AS (
      SELECT qid, id, rel, mmr2 FROM (
        SELECT qid, id, rel, mmr2,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY mmr2 DESC, id) AS rn
        FROM c2) WHERE rn = 1),
    c3 AS (
      SELECT c.qid, c.id, c.rel, c.rel - max(pd.pdot) AS mmr2
      FROM cand c
      JOIN s1 ON s1.qid = c.qid
      JOIN s2 ON s2.qid = c.qid
      JOIN pd ON pd.qid = c.qid AND pd.ia = c.id
             AND (pd.ib = s1.id OR pd.ib = s2.id)
      WHERE c.id <> s1.id AND c.id <> s2.id
      GROUP BY c.qid, c.id, c.rel),
    s3 AS (
      SELECT qid, id, rel, mmr2 FROM (
        SELECT qid, id, rel, mmr2,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY mmr2 DESC, id) AS rn
        FROM c3) WHERE rn = 1)
    SELECT qid AS query_id, CAST(1 AS BIGINT) AS rnk, id AS neighbor_id,
           CAST(rel AS BIGINT) AS rel_dot, CAST(rel AS BIGINT) AS mmr2
    FROM s1
    UNION ALL
    SELECT qid, CAST(2 AS BIGINT), id, CAST(rel AS BIGINT),
           CAST(mmr2 AS BIGINT) FROM s2
    UNION ALL
    SELECT qid, CAST(3 AS BIGINT), id, CAST(rel AS BIGINT),
           CAST(mmr2 AS BIGINT) FROM s3
    """,
    doc="D4 (retrieval diversification, PRODUCTION SHAPE): batch MMR "
    "over many queries — candidate generation as ONE relational pass "
    "(every (query, corpus) rel dot cut to top-16 per query by a "
    "rank window PARTITIONED BY QUERY; at 100 TB an ANN probe feeds "
    "the same group schema), then the greedy selection per query in "
    "ONE applyInPandas group kernel: 16 micros vectors per group, "
    "pairwise dots and 3 greedy argmaxes in int64 numpy — group state "
    "bounded by n_cand*dim int64s at any corpus size, queries "
    "parallel across executors (operators/similarity.py:mmr_batch). "
    "Because the kernel is pure integer arithmetic with the twin's "
    "tie-breaks, even the Python group kernel is DRIVER-ORACLED "
    "bit-for-bit: the oracle generalizes d4_mmr_diversify's chain "
    "per-query (argmax CTEs become per-qid rank windows). Queries = "
    "the 3 lowest-LCG vector ids; tests pin batch == twin on the "
    "twin's query.",
)
def d4_mmr_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    emb = read_testdata(spark, sf_dir, "embeddings")
    lcg = S.lcg_pick(F.col("vec_id"))
    queries = (
        emb.select("vec_id")
        .withColumn("lcg", lcg)
        .orderBy("lcg", "vec_id")
        .limit(3)
        .select(F.col("vec_id").alias("query_id"))
    )
    return S.mmr_batch(emb, queries, k=3, n_cand=16)


@register(
    "d4_mmr_ann",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(
               CAST(embedding AS DOUBLE[]),
               x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS ei
      FROM embeddings),
    seedrank AS (
      SELECT vec_id,
             row_number() OVER (
               ORDER BY (1103515245 * (vec_id % 2147483647) + 12345) % 2147483647,
                        vec_id) - 1 AS cidx
      FROM v),
    seeds AS (
      SELECT s.cidx, v.ei AS ci
      FROM seedrank s JOIN v ON s.vec_id = v.vec_id
      WHERE s.cidx < 16),
    dims AS (SELECT unnest(range(64)) AS d),
    dots AS (
      SELECT v.vec_id, s.cidx,
             sum(v.ei[CAST(dims.d + 1 AS INT)]
                 * s.ci[CAST(dims.d + 1 AS INT)]) AS idot
      FROM v CROSS JOIN seeds s CROSS JOIN dims
      GROUP BY v.vec_id, s.cidx),
    pr AS (
      SELECT vec_id, cidx,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY idot DESC, cidx) AS prnk
      FROM dots),
    assign AS (SELECT vec_id, cidx AS cluster FROM pr WHERE prnk = 1),
    qs AS (
      SELECT vec_id AS qid, ei AS qi FROM v
      ORDER BY (1103515245 * (vec_id % 2147483647) + 12345) % 2147483647,
               vec_id
      LIMIT 3),
    probes AS (
      SELECT q.qid, pr.cidx AS cluster
      FROM qs q JOIN pr ON pr.vec_id = q.qid AND pr.prnk <= 4),
    rel AS (
      SELECT p.qid, a.vec_id AS id,
             sum(vn.ei[CAST(dims.d + 1 AS INT)]
                 * q2.qi[CAST(dims.d + 1 AS INT)]) AS rel
      FROM probes p
      JOIN assign a ON a.cluster = p.cluster AND a.vec_id <> p.qid
      JOIN v vn ON vn.vec_id = a.vec_id
      JOIN qs q2 ON q2.qid = p.qid
      CROSS JOIN dims
      GROUP BY p.qid, a.vec_id),
    cand AS (
      SELECT qid, id, rel FROM (
        SELECT qid, id, rel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY rel DESC, id) AS crnk
        FROM rel)
      WHERE crnk <= 16),
    pd AS (
      SELECT a.qid, a.id AS ia, b.id AS ib,
             sum(va.ei[CAST(dims.d + 1 AS INT)]
                 * vb.ei[CAST(dims.d + 1 AS INT)]) AS pdot
      FROM cand a JOIN cand b ON a.qid = b.qid AND a.id <> b.id
      JOIN v va ON va.vec_id = a.id
      JOIN v vb ON vb.vec_id = b.id
      CROSS JOIN dims
      GROUP BY a.qid, a.id, b.id),
    s1 AS (
      SELECT qid, id, rel FROM (
        SELECT qid, id, rel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY rel DESC, id) AS rn
        FROM cand) WHERE rn = 1),
    c2 AS (
      SELECT c.qid, c.id, c.rel, c.rel - pd.pdot AS mmr2
      FROM cand c
      JOIN s1 ON s1.qid = c.qid AND c.id <> s1.id
      JOIN pd ON pd.qid = c.qid AND pd.ia = c.id AND pd.ib = s1.id),
    s2 AS (
      SELECT qid, id, rel, mmr2 FROM (
        SELECT qid, id, rel, mmr2,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY mmr2 DESC, id) AS rn
        FROM c2) WHERE rn = 1),
    c3 AS (
      SELECT c.qid, c.id, c.rel, c.rel - max(pd.pdot) AS mmr2
      FROM cand c
      JOIN s1 ON s1.qid = c.qid
      JOIN s2 ON s2.qid = c.qid
      JOIN pd ON pd.qid = c.qid AND pd.ia = c.id
             AND (pd.ib = s1.id OR pd.ib = s2.id)
      WHERE c.id <> s1.id AND c.id <> s2.id
      GROUP BY c.qid, c.id, c.rel),
    s3 AS (
      SELECT qid, id, rel, mmr2 FROM (
        SELECT qid, id, rel, mmr2,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY mmr2 DESC, id) AS rn
        FROM c3) WHERE rn = 1)
    SELECT qid AS query_id, CAST(1 AS BIGINT) AS rnk, id AS neighbor_id,
           CAST(rel AS BIGINT) AS rel_dot, CAST(rel AS BIGINT) AS mmr2
    FROM s1
    UNION ALL
    SELECT qid, CAST(2 AS BIGINT), id, CAST(rel AS BIGINT),
           CAST(mmr2 AS BIGINT) FROM s2
    UNION ALL
    SELECT qid, CAST(3 AS BIGINT), id, CAST(rel AS BIGINT),
           CAST(mmr2 AS BIGINT) FROM s3
    """,
    doc="D4 (retrieval diversification OVER an ANN probe — the "
    "composition d4_mmr_batch's doc promises, shipped): candidate "
    "generation is the oracle-exact IVF twin's assign -> probe "
    "topology (d4_ann_ivf_rank's LCG seed centroids and integer-"
    "micros dot assignment, n_probe=4 of 16 lists), feeding the SAME "
    "greedy group kernel (_mmr_pick) as the exact-candidate path — "
    "only the candidate SOURCE differs, so a probe scans ~1/4 of the "
    "corpus per query instead of all of it "
    "(operators/similarity.py:mmr_batch_ann). Every membership and "
    "ordering decision is integer arithmetic, so the full composition "
    "stays driver-oracled bit-for-bit. The agreement test pins "
    "mmr_batch_ann == mmr_batch when every list is probed "
    "(n_probe == n_centroids), isolating the probe as the only "
    "divergence. Queries = the 3 lowest-LCG vector ids.",
)
def d4_mmr_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    emb = read_testdata(spark, sf_dir, "embeddings")
    lcg = S.lcg_pick(F.col("vec_id"))
    queries = (
        emb.select("vec_id")
        .withColumn("lcg", lcg)
        .orderBy("lcg", "vec_id")
        .limit(3)
        .select(F.col("vec_id").alias("query_id"))
    )
    return S.mmr_batch_ann(
        emb, queries, k=3, n_cand=16, n_centroids=16, n_probe=4
    )


@register(
    "d4_quality_score",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tokens,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS mtl
      FROM documents)
    SELECT doc_id, n_tokens,
           least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
           * (CASE WHEN mtl >= 2.0 AND mtl <= 12.0 THEN 1.0 ELSE 0.5 END)
             AS quality
    FROM s
    """,
    doc="D4: heuristic quality score — length saturation x token-shape "
    "sanity, rational-exact (operators/text.py:quality_score).",
)
def d4_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.quality_score(read_testdata(spark, sf_dir, "documents"))


@register(
    "d4_lang_id",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    c AS (
      SELECT doc_id, len(toks) AS n_tokens,
             len(list_filter(toks, x -> list_contains(
               ['the','a','of','and','to','in','is','that','it','for'], x)))
               AS n_stopwords
      FROM t)
    SELECT doc_id, n_stopwords, n_tokens,
           round(CAST(n_stopwords AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           CASE WHEN CAST(n_stopwords AS DOUBLE) / n_tokens >= 0.05
                THEN 'en' ELSE 'unknown' END AS lang_pred
    FROM c
    """,
    doc="D4: stopword-ratio language ID heuristic "
    "(operators/text.py:lang_id).",
)
def d4_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.lang_id(read_testdata(spark, sf_dir, "documents"))


@register(
    "d4_doc_fingerprint",
    oracle="""
    WITH tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    postok AS (
      SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos,
             unnest(toks) AS token
      FROM tokl),
    vocab AS (
      SELECT token, row_number() OVER (ORDER BY token) - 1 AS tid
      FROM (SELECT DISTINCT token FROM postok)),
    seq AS (
      SELECT doc_id, list(tid ORDER BY pos) AS tids
      FROM postok JOIN vocab USING (token) GROUP BY doc_id)
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), tids),
                       (acc, t) -> (acc * 31 + t) % 1000000007)
             AS fingerprint
    FROM seq
    """,
    doc="D4: order-sensitive rolling-hash document fingerprint over "
    "dense-ranked token ids (operators/text.py:doc_fingerprint) — "
    "integer-exact fold, reproducible in any engine.",
)
def d4_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.doc_fingerprint(read_testdata(spark, sf_dir, "documents"))


@register(
    "d4_lm_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS token
      FROM documents),
    v AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT count(*) AS total FROM tok),
    s AS (
      SELECT doc_id,
             CAST(floor(ln(CAST(cnt AS DOUBLE) / total) * 1000000 + 0.5)
                  AS BIGINT) AS lp
      FROM tok JOIN v USING (token) CROSS JOIN tot)
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(lp) AS BIGINT) AS logprob_micros,
           CAST(floor(CAST(sum(lp) AS DOUBLE) / count(*)) AS BIGINT)
             AS avg_lp_micros
    FROM s GROUP BY doc_id
    """,
    doc="D4: CCNet-style LM quality scoring (Wenzek et al. 2020) with a "
    "corpus-trained unigram model — per-doc total and average token "
    "log-probability. Per-token ln(cnt/total) is rounded half-up to "
    "integer micros BEFORE summing, so the aggregate is associative and "
    "bit-exact under any partial-agg order; vocabulary and corpus total "
    "broadcast (operators/text.py:unigram_logprob).",
)
def d4_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.text import unigram_logprob

    return unigram_logprob(read_testdata(spark, sf_dir, "documents"))


@register(
    "d4_bigram_logprob",
    oracle="""
    WITH lsts AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS lst
      FROM documents),
    toks AS (
      SELECT doc_id, unnest(lst) AS token,
             unnest(range(1, len(lst) + 1)) AS pos
      FROM lsts),
    uni AS (SELECT token, count(*) AS u FROM toks GROUP BY token),
    tot AS (SELECT count(*) AS n FROM toks),
    seq AS (
      SELECT doc_id, token AS w2,
             lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
      FROM toks),
    big AS (SELECT w1, w2, count(*) AS c2 FROM seq
            WHERE w1 IS NOT NULL GROUP BY w1, w2),
    c1t AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM big GROUP BY w1),
    scored AS (
      SELECT s.doc_id,
             CASE WHEN s.w1 IS NULL THEN
               CAST(floor(ln(u.u / t.n) * 1000000 + 0.5) AS BIGINT)
             ELSE
               CAST(floor(ln(0.75 * (b.c2 / k.c1) + 0.25 * (u.u / t.n))
                    * 1000000 + 0.5) AS BIGINT)
             END AS lp
      FROM seq s
      JOIN uni u ON s.w2 = u.token
      CROSS JOIN tot t
      LEFT JOIN big b ON s.w1 = b.w1 AND s.w2 = b.w2
      LEFT JOIN c1t k ON s.w1 = k.w1)
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(lp) AS BIGINT) AS logprob_micros,
           CAST(floor(CAST(sum(lp) AS DOUBLE) / count(*)) AS BIGINT)
             AS avg_lp_micros
    FROM scored GROUP BY doc_id
    """,
    doc="D4: interpolated BIGRAM LM scoring — one order up from "
    "d4_lm_logprob toward CCNet's 5-gram KenLM: p(w|prev) = "
    "0.75*(c2/c1) + 0.25*(unigram), first token unigram-only; per-token "
    "ln(p) in integer micros before summing (associative, bit-exact). "
    "Bigrams from array slices (no position self-join); trained tables "
    "probe via plain equi-joins, AQE decides broadcasts "
    "(operators/text.py:bigram_logprob).",
)
def d4_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.text import bigram_logprob

    return bigram_logprob(read_testdata(spark, sf_dir, "documents"))


@register(
    "d4_dup_passage",
    oracle="""
    WITH tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 3, 1) + 1)) AS i
      FROM tokl),
    sh AS (
      SELECT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 3 AS INT)], ' ')
               AS shingle
      FROM idx),
    g AS (
      SELECT doc_id, shingle, count(*) AS cnt
      FROM sh WHERE shingle <> '' GROUP BY doc_id, shingle),
    tot AS (SELECT shingle, sum(cnt) AS corpus_cnt FROM g GROUP BY shingle)
    SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN corpus_cnt >= 2 THEN cnt ELSE 0 END)
                AS BIGINT) AS n_dup_grams,
           floor(CAST(sum(CASE WHEN corpus_cnt >= 2 THEN cnt ELSE 0 END)
                      AS DOUBLE) / sum(cnt) * 1000000 + 0.5) / 1000000
             AS dup_passage_frac
    FROM g JOIN tot USING (shingle)
    GROUP BY doc_id
    """,
    doc="D4: ExactSubstr-inspired duplicated-passage fraction (Lee et al. "
    "2021) — per doc, the share of 4-gram occurrences whose gram recurs "
    "anywhere in the corpus. Two map-side-combined hash aggs + one hash "
    "join on the gram key; the fraction is rounded half-up via "
    "floor(x*1e6+0.5) on BOTH engines because integer-ratio quotients can "
    "be exactly dyadic (operators/dedup.py:dup_passage_stats).",
)
def d4_dup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.sources.readers import read_doc_shingle_bag

    return D.dup_passage_stats(
        read_testdata(spark, sf_dir, "documents"),
        n=4,
        shingle_rel=read_doc_shingle_bag(spark, sf_dir, 4),
    )


@register(
    "d4_bm25_topk",
    oracle="""
    WITH tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    tot AS (
      SELECT CAST(sum(len(toks)) AS DOUBLE) AS t_tokens,
             CAST(count(*) AS DOUBLE) AS n_docs
      FROM tokl),
    dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM tokl),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM tokl),
    q AS (SELECT unnest(['hash', 'join', 'filter']) AS term),
    hits AS (
      SELECT doc_id, tok.term FROM tok JOIN q ON tok.term = q.term),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      FROM hits GROUP BY doc_id, term),
    dfr AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
      FROM hits GROUP BY term),
    contrib AS (
      SELECT tf.doc_id,
             CAST(floor(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * ((tf * 2.2)
                  / (tf + 1.2 * (0.25 + 0.75 * (dl.dl * n_docs / t_tokens))))
               * 1000000 + 0.5) AS BIGINT) AS c
      FROM tf
      JOIN dfr USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id, tot),
    scored AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micros,
             CAST(count(*) AS BIGINT) AS n_hits
      FROM contrib GROUP BY doc_id),
    ranked AS (
      SELECT row_number() OVER (ORDER BY score_micros DESC, doc_id)
               AS rank, doc_id, score_micros, n_hits
      FROM scored)
    SELECT CAST(rank AS BIGINT) AS rank, doc_id, score_micros, n_hits
    FROM ranked WHERE rank <= 10
    """,
    doc="D4: BM25 lexical retrieval (Robertson/Sparck Jones; Lucene "
    "idf form) — the keyword-search baseline a RAG/curation pipeline "
    "keeps next to its embedding index, for the fixed query "
    "'hash join filter' over the documents corpus. Cross-engine "
    "exact by the d4_lm_logprob convention: every per-term "
    "contribution idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) derives "
    "from exact integer counts, is evaluated with identically-"
    "parenthesized double arithmetic on both engines (dl/avgdl "
    "stated as dl*N/T), and is floored HALF-UP to integer micros "
    "BEFORE the per-doc sum — associative, so the hash is exact "
    "(operators/text.py:bm25_topk). k1=1.2, b=0.75, k=10, doc_id "
    "tie-break. Scale shape: the broadcast query-term join prunes "
    "the posting shuffle to |Q| terms; totals ride one broadcast "
    "1-row crossJoin; the global order is a sort-limit "
    "(TakeOrderedAndProject), with the rank window over k rows only.",
)
def d4_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.text import bm25_topk

    return bm25_topk(
        read_testdata(spark, sf_dir, "documents"),
        ["hash", "join", "filter"],
        k=10,
    )


@register(
    "d4_dup_passage_cut",
    oracle="""
    WITH tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    st AS (
      SELECT doc_id, toks,
             unnest(range(greatest(len(toks) - 3, 0))) AS s
      FROM tokl),
    g AS (
      SELECT doc_id, s,
             array_to_string(
               toks[CAST(s + 1 AS INT):CAST(s + 4 AS INT)], ' ') AS gram
      FROM st),
    cnt AS (SELECT gram, count(*) AS c FROM g GROUP BY gram),
    dup_starts AS (
      SELECT g.doc_id, g.s FROM g JOIN cnt ON g.gram = cnt.gram
      WHERE c >= 2),
    covered AS (
      SELECT DISTINCT doc_id, s + o.o AS p
      FROM dup_starts, (SELECT unnest(range(4)) AS o) o),
    tok AS (
      SELECT doc_id, toks,
             unnest(range(len(toks))) AS p
      FROM tokl),
    marked AS (
      SELECT t.doc_id, t.p,
             t.toks[CAST(t.p + 1 AS INT)] AS tk,
             c.p IS NOT NULL AS cut
      FROM tok t LEFT JOIN covered c
        ON t.doc_id = c.doc_id AND t.p = c.p),
    agg AS (
      SELECT doc_id,
             count(*) AS n_tokens,
             sum(CASE WHEN cut THEN 1 ELSE 0 END) AS n_cut,
             coalesce(string_agg(CASE WHEN NOT cut THEN tk END,
                                 ' ' ORDER BY p), '') AS kept_text
      FROM marked GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(a.n_cut, 0) AS BIGINT) AS n_cut,
           CAST(coalesce(a.n_tokens, 0) - coalesce(a.n_cut, 0)
                AS BIGINT) AS n_kept,
           coalesce(a.kept_text, '') AS kept_text
    FROM tokl t LEFT JOIN agg a ON t.doc_id = a.doc_id
    """,
    doc="D4: ExactSubstr REMOVAL form (r10 VERDICT task 5; Lee et al. "
    "2021 §4.1 — the decision the paper ships, where d4_dup_passage "
    "only reports): a token position is CUT iff covered by any 4-gram "
    "occurrence appearing >= 2 times corpus-wide; kept_text is the "
    "uncovered tokens space-joined in original order, so the driver "
    "hashes the ACTUAL surviving text, not just counters "
    "(operators/dedup.py:exactsubstr_cut). Conservation — n_kept + "
    "n_cut == n_tokens AND kept/cut tokens re-interleave to the "
    "original document — is pinned by a hypothesis test against a "
    "Python model with planted cross-doc duplications. Scale shape: "
    "gram-bag counts, duplicated starts, a bounded explode (n "
    "positions per dup start, distinct), one co-partitioned "
    "(doc, pos) join, per-doc fold — no windows over whole docs.",
)
def d4_dup_passage_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exactsubstr_cut(
        read_testdata(spark, sf_dir, "documents"), n=4
    )


@register(
    "d4_semantic_dedup",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    seeds AS (
      SELECT e AS sv,
             CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
               AS cluster
      FROM v ORDER BY vec_id LIMIT 8),
    sims AS (
      SELECT v.vec_id, s.cluster,
             round(list_dot_product(v.e, s.sv)
                   / (sqrt(list_dot_product(v.e, v.e))
                      * sqrt(list_dot_product(s.sv, s.sv))), 4)
               AS centroid_sim
      FROM v CROSS JOIN seeds s),
    assigned AS (
      SELECT vec_id, cluster, centroid_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY centroid_sim DESC, cluster) AS rn
        FROM sims) WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT x.vec_id
      FROM assigned x
      JOIN assigned y ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
      JOIN v vx ON vx.vec_id = x.vec_id
      JOIN v vy ON vy.vec_id = y.vec_id
      WHERE round(list_dot_product(vx.e, vy.e)
                  / (sqrt(list_dot_product(vx.e, vx.e))
                     * sqrt(list_dot_product(vy.e, vy.e))), 4) >= 0.3
        AND (y.centroid_sim < x.centroid_sim
             OR (y.centroid_sim = x.centroid_sim
                 AND y.vec_id < x.vec_id)))
    SELECT a.vec_id, a.cluster, a.centroid_sim,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS keep
    FROM assigned a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    """,
    doc="D4: SemDeDup-style semantic dedup (Abbas et al. 2023) — coarse "
    "quantize on deterministic seed centroids, pairwise cosine ONLY "
    "within a cluster, keep the pair member farther from its centroid. "
    "Broadcast seed matrix, k-row window argmax, cluster-bucketed "
    "self-join — never all-pairs "
    "(operators/similarity.py:semantic_dedup).",
)
def d4_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb, n_clusters=8, epsilon=0.3)


@register(
    "d4_pii_scrub",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || repeat(' contact ' || source || '@example.com ref '
                            || CAST((doc_id * 7919) % 100000 AS VARCHAR),
                            CAST(1 + doc_id % 3 AS INT)) AS a
      FROM documents),
    e AS (
      SELECT doc_id, a,
             regexp_replace(a, '[a-z0-9]+@[a-z0-9]+\\.[a-z]+',
                            '<EMAIL>', 'g') AS after_email
      FROM aug)
    SELECT doc_id,
           CAST(len(regexp_extract_all(a,
                '[a-z0-9]+@[a-z0-9]+\\.[a-z]+')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(after_email, '[0-9]+')) AS BIGINT)
             AS n_numbers,
           regexp_replace(after_email, '[0-9]+', '<NUM>', 'g') AS scrubbed
    FROM e
    """,
    doc="D4: PII redaction pass — email + digit-run scrubbing as pure "
    "regexp_replace projections (zero shuffles, fused into codegen). The "
    "synthetic corpus has no PII, so each doc is deterministically "
    "augmented with 1-3 contact trailers derived from its own columns; "
    "on real data the augmentation is dropped "
    "(operators/text.py:pii_scrub).",
)
def d4_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.pii_scrub(read_testdata(spark, sf_dir, "documents"))


@register(
    "d4_text_normalize",
    oracle="""
    WITH noisy AS (
      SELECT doc_id,
             '  ' || upper(text) || ' !! ' || source || '#' || doc_id
               AS text
      FROM documents),
    n AS (
      SELECT doc_id, text,
             trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
      FROM noisy)
    SELECT doc_id, norm_text, sha256(norm_text) AS norm_sha,
           CAST(length(text) - length(norm_text) AS BIGINT)
             AS n_chars_removed
    FROM n
    """,
    doc="D4 (canonicalization): the standard pre-dedup text-normalize "
    "pass — lowercase, strip non-alphanumerics, squeeze whitespace, trim, "
    "plus a sha2 digest of the canonical form (what exact-dedup and shard "
    "assignment key on, so trivially-reformatted duplicates collide). "
    "Run over a deterministically-noised copy of the corpus (upper-case + "
    "injected punctuation) so the transforms demonstrably fire. ONE "
    "codegen projection over the scan, zero exchanges — explicit ASCII "
    "character classes keep Java and RE2 regex semantics byte-identical "
    "(operators/text.py:normalize_text).",
)
def d4_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = read_testdata(spark, sf_dir, "documents")
    noisy = docs.select(
        "doc_id",
        F.concat(
            F.lit("  "), F.upper("text"), F.lit(" !! "),
            F.col("source"), F.lit("#"), F.col("doc_id"),
        ).alias("text"),
    )
    return TX.normalize_text(noisy)


@register(
    "d5_format_sniff",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CASE CAST(doc_id % 5 AS INT)
                WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
                WHEN 3 THEN 'wav' ELSE 'unknown' END AS sniffed_format,
           CASE CAST(doc_id % 5 AS INT)
                WHEN 0 THEN CAST(doc_id % 3 AS INT) = 0
                WHEN 1 THEN CAST(doc_id % 3 AS INT) = 0
                WHEN 2 THEN CAST(doc_id % 3 AS INT) = 0
                WHEN 3 THEN CAST(doc_id % 3 AS INT) = 1
                ELSE NULL END AS type_consistent
    FROM documents
    """,
    doc="D5 [north-star multimodal]: MAGIC-BYTE format sniffing — detect "
    "the ACTUAL content format (png/jpeg/gif/wav/avi/mp4) from header "
    "bytes, entirely in codegen (substring over BINARY + hex prefix "
    "tests), and flag rows whose declared media_type disagrees — the "
    "validation step before any decode, with NO codec dependency (this "
    "is real, not stubbed). Blobs here are synthesized with genuine "
    "magic headers cycling by doc_id%5 (one in five has none), so the "
    "oracle can state the expected classification in closed form; the "
    "byte-level detection itself is pinned by unit tests on real "
    "png/jpeg/gif/wav/avi/mp4 headers "
    "(operators/multimodal.py:sniff_media_format).",
)
def d5_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.multimodal import sniff_media_format

    media = _documents_as_media(spark, sf_dir)
    # prepend genuine magic headers, cycling by id (index 4 = no magic)
    magics = F.array(
        F.unhex(F.lit("89504E470D0A1A0A")),            # PNG
        F.unhex(F.lit("FFD8FFE000104A464946")),        # JPEG/JFIF
        F.unhex(F.lit("474946383761")),                # GIF87a
        F.unhex(F.lit("524946460000000057415645")),    # RIFF....WAVE
        F.unhex(F.lit("")),                            # none
    )
    blobbed = media.withColumn(
        "content",
        F.concat(
            F.element_at(magics, (F.col("media_id") % 5 + 1).cast("int")),
            F.col("content"),
        ),
    )
    out = sniff_media_format(blobbed)
    return out.select("media_id", "media_type", "sniffed_format",
                      "type_consistent")


@register(
    "d4_incremental_dedup",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             sha256(trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_sha
      FROM documents),
    batch AS (SELECT * FROM n WHERE doc_id % 5 = 0),
    corpus AS (SELECT norm_sha FROM n WHERE doc_id % 5 <> 0)
    SELECT b.norm_sha, min(b.doc_id) AS keep_doc_id,
           count(*) AS n_batch_copies
    FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.norm_sha = b.norm_sha)
    GROUP BY b.norm_sha
    """,
    doc="D4 (incremental ingest dedup): dedup a NEW batch (doc_id%5=0 "
    "split) against the EXISTING corpus without touching the corpus — "
    "canonicalize+digest both sides, collapse the batch on its digest "
    "(shuffle sized by the batch), then LEFT ANTI against the corpus's "
    "digest index (operators/dedup.py:incremental_exact_dedup). This is "
    "the per-ingest shape at 100 TB: the corpus-side digest table is the "
    "persisted dedup index (store it bucketed on norm_sha and the anti "
    "join is one-sided); a from-scratch re-dedup of corpus+batch per "
    "arrival would re-shuffle 100 TB per crawl drop. North-star "
    "grounding: BASELINE.json near-dup objective; Lee et al. 2021's "
    "dedup-before-training pipeline run incrementally.",
)
def d4_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = read_testdata(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return D.incremental_exact_dedup(batch, corpus)


@register(
    "d4_embed_quantize",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS raw_scale
      FROM embeddings),
    g AS (
      SELECT vec_id, embedding,
             CASE WHEN raw_scale = 0 THEN 1.0 ELSE raw_scale END AS scale
      FROM s)
    SELECT vec_id,
           CAST(floor(scale * 1000000 + 0.5) AS BIGINT) AS scale_ppm,
           CAST(i - 1 AS BIGINT) AS dim_idx,
           CAST(floor(CAST(embedding[i] AS DOUBLE) / scale * 127.0 + 0.5)
                AS BIGINT) AS code
    FROM g, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    """,
    doc="D4 (embedding compression): symmetric int8 scalar quantization "
    "of the embedding corpus — per-vector max-abs scale, codes in "
    "[-127,127] (operators/similarity.py:quantize_embeddings). The "
    "storage form for 100 TB embedding stores (4x smaller, "
    "recall-neutral for int8 retrieval); one codegen projection + "
    "posexplode, zero exchanges. Bit-exact across engines by "
    "element-order-deterministic double arithmetic and the floor(x+0.5) "
    "rounding convention; the numpy cross-check in tests/ additionally "
    "bounds per-element reconstruction error by scale/254.",
)
def d4_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    return S.quantize_embeddings(emb)


def _le_hex(col, nbytes: int):
    """Little-endian hex of an integer column (synthesis-side mirror of
    multimodal._le_uint)."""
    from pyspark.sql import functions as F

    return F.concat(
        *[
            F.lpad(F.hex(F.shiftright(col, 8 * i).bitwiseAND(F.lit(255))),
                   2, "0")
            for i in range(nbytes)
        ]
    )


@register(
    "d5_wav_meta",
    oracle="""
    WITH params AS (
      SELECT doc_id AS media_id,
             1 + doc_id % 2 AS ch,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8000
                  WHEN 1 THEN 16000 ELSE 44100 END AS rate,
             1000 + doc_id % 5000 AS n_samples,
             doc_id % 7 = 0 AS is_png
      FROM documents)
    SELECT media_id,
           CASE WHEN is_png THEN NULL ELSE ch END AS n_channels,
           CASE WHEN is_png THEN NULL ELSE rate END AS sample_rate,
           CASE WHEN is_png THEN NULL ELSE 16 END AS bits_per_sample,
           CASE WHEN is_png THEN NULL
                ELSE n_samples * ch * 2 END AS data_bytes,
           CASE WHEN is_png THEN NULL
                ELSE (n_samples * ch * 2 * 1000) // (rate * ch * 2)
           END AS duration_ms
    FROM params
    """,
    doc="D5 [north-star multimodal]: WAV header metadata extraction — "
    "REAL binary parsing with no codec dependency: the canonical 44-byte "
    "RIFF/PCM header decodes entirely in codegen (hex the header once, "
    "little-endian fields = byte-pair reversal + conv(16,10); "
    "operators/multimodal.py:wav_header_meta), duration in exact integer "
    "ms. Blobs are synthesized with genuine headers (channels/rate/"
    "length cycling by doc_id; every 7th row is a PNG that must yield "
    "NULLs), so the oracle states every field in closed form; the parser "
    "itself is additionally pinned against Python's own wave-module "
    "output on real bytes (tests/test_multimodal.py). This is the "
    "pre-decode triage a 100 TB audio corpus runs: length/rate filters "
    "drop the bulk of a crawl without touching a codec.",
)
def d5_wav_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.multimodal import wav_header_meta

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id")
    ch = (1 + F.col("doc_id") % 2).cast("bigint")
    rate = (
        F.when(F.col("doc_id") % 3 == 0, 8000)
        .when(F.col("doc_id") % 3 == 1, 16000)
        .otherwise(44100)
        .cast("bigint")
    )
    n_samples = (1000 + F.col("doc_id") % 5000).cast("bigint")
    data_bytes = n_samples * ch * 2
    byte_rate = rate * ch * 2
    wav_hex = F.concat(
        F.lit("52494646"), _le_hex(data_bytes + 36, 4),   # 'RIFF' + size
        F.lit("57415645"), F.lit("666D7420"),             # 'WAVE' 'fmt '
        _le_hex(F.lit(16).cast("bigint"), 4),             # fmt chunk size
        _le_hex(F.lit(1).cast("bigint"), 2),              # PCM
        _le_hex(ch, 2),
        _le_hex(rate, 4),
        _le_hex(byte_rate, 4),
        _le_hex(ch * 2, 2),                               # block align
        _le_hex(F.lit(16).cast("bigint"), 2),             # bits/sample
        F.lit("64617461"), _le_hex(data_bytes, 4),        # 'data' + size
    )
    png_hex = F.lit("89504E470D0A1A0A" + "00" * 36)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(
            F.when(F.col("doc_id") % 7 == 0, png_hex).otherwise(wav_hex)
        ).alias("content"),
    )
    return wav_header_meta(media)


@register(
    "d4_incremental_neardup",
    oracle=None,  # hash-mode ids (xxhash64) are engine-specific —
    # rows-only; the cross-pair equivalence vs the full-union LSH run is
    # pinned engine-side by
    # test_incremental_minhash_matches_full_corpus_cross_pairs
    doc="D4 (incremental ingest NEAR-dup): MinHash-LSH screening of a "
    "new batch (doc_id%5=0 split) against the existing corpus "
    "(operators/dedup.py:incremental_minhash_neardup) — the production "
    "companion to d4_incremental_dedup for non-identical duplicates. "
    "ids are hash mode BY CONSTRUCTION: cross-batch stability is the "
    "point (rank ids depend on the vocabulary they were ranked over; "
    "hashed ids are a pure function of the shingle), which is also why "
    "this entry is rows-only — the engine-side property test proves the "
    "split computation finds exactly the full-union run's cross pairs. "
    "Deployment shape: the corpus's (band, sig) table is the persisted "
    "near-dup index; per drop you compute batch signatures + ONE "
    "equi-join against it — never corpus x corpus.",
)
def d4_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = read_testdata(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return D.incremental_minhash_neardup(batch, corpus)


@register(
    "d4_incremental_neardup_rank",
    oracle="""
    WITH tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 1, 1) + 1)) AS i
      FROM tokl),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 1 AS INT)], ' ')
               AS shingle
      FROM idx),
    vocab AS (
      SELECT shingle, row_number() OVER (ORDER BY shingle) - 1 AS tid
      FROM (SELECT DISTINCT shingle FROM sh)),
    tt AS (SELECT doc_id, tid FROM sh JOIN vocab USING (shingle)),
    hp AS (
      SELECT CAST(i AS INT) AS i,
             CAST((i * 2654435761 + 1) % 2147483647 AS BIGINT) AS a,
             CAST((i * 40503 + 7) % 2147483647 AS BIGINT) AS b
      FROM (SELECT unnest(range(16)) AS i)),
    mh AS (
      SELECT doc_id, i, min((a * tid + b) % 2147483647) AS h
      FROM tt CROSS JOIN hp GROUP BY doc_id, i),
    sig AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(CAST(h AS VARCHAR), ',' ORDER BY i) AS s
      FROM mh GROUP BY doc_id, band),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.s = b.s AND a.doc_id < b.doc_id)
    SELECT CASE WHEN doc_a % 5 = 0 THEN doc_a ELSE doc_b END AS batch_id,
           CASE WHEN doc_a % 5 = 0 THEN doc_b ELSE doc_a END AS corpus_id
    FROM pairs
    WHERE (doc_a % 5 = 0) <> (doc_b % 5 = 0)
    """,
    doc="D4 (incremental NEAR-dup, oracle twin): the rank-mode form of "
    "d4_incremental_neardup — full-union MinHash-LSH (same integer-LCG "
    "determinism as d4_minhash_lsh) restricted to cross (batch, corpus) "
    "pairs, batch = doc_id%5=0. This states the incremental operator's "
    "CONTRACT in oracle-exact SQL: incremental_minhash_neardup finds "
    "exactly these pairs (the engine-side equivalence property "
    "test_incremental_minhash_matches_full_corpus_cross_pairs pins the "
    "hash-mode path to the full-union run; this entry makes the same "
    "claim driver-checkable). Production runs the hash-mode incremental "
    "path — rank ids need a shared vocabulary, which only the union "
    "provides — so this twin exists purely to close the oracle gap.",
)
def d4_incremental_neardup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.sources.readers import read_doc_shingle_set

    docs = read_testdata(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, num_hashes=16, band_size=4, shingle_n=2,
        shingle_rel=read_doc_shingle_set(spark, sf_dir, 2),
    )
    a_in = F.col("doc_a") % 5 == 0
    b_in = F.col("doc_b") % 5 == 0
    return pairs.filter(a_in != b_in).select(
        F.when(a_in, F.col("doc_a")).otherwise(F.col("doc_b")).alias("batch_id"),
        F.when(a_in, F.col("doc_b")).otherwise(F.col("doc_a")).alias("corpus_id"),
    )


@register(
    "d5_png_meta",
    oracle="""
    WITH params AS (
      SELECT doc_id AS media_id,
             16 + doc_id % 2048 AS w,
             16 + (doc_id * 7) % 1200 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END AS depth,
             doc_id % 6 = 0 AS is_jpeg
      FROM documents)
    SELECT media_id,
           CASE WHEN is_jpeg THEN NULL ELSE w END AS width,
           CASE WHEN is_jpeg THEN NULL ELSE h END AS height,
           CASE WHEN is_jpeg THEN NULL ELSE depth END AS bit_depth,
           CASE WHEN is_jpeg THEN NULL ELSE 2 END AS color_type,
           CASE WHEN is_jpeg THEN NULL
                ELSE (w * 1000) // h END AS aspect_pm
    FROM params
    """,
    doc="D5 [north-star multimodal]: PNG IHDR metadata extraction — the "
    "image twin of d5_wav_meta: width/height/bit-depth/color-type parse "
    "at fixed offsets as big-endian conv(hex-substring, 16, 10), plus an "
    "exact integer per-mille aspect ratio "
    "(operators/multimodal.py:png_header_meta) — resolution/aspect "
    "triage over an image crawl with no pixel codec. Headers are "
    "synthesized in closed form (dims cycling by doc_id; every 6th row "
    "a JPEG that must yield NULLs); the parser is separately pinned "
    "against a genuine spec-assembled PNG byte stream in "
    "tests/test_multimodal.py.",
)
def d5_png_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.multimodal import png_header_meta

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id")
    w = (16 + F.col("doc_id") % 2048).cast("bigint")
    h = (16 + (F.col("doc_id") * 7) % 1200).cast("bigint")
    depth = F.when(F.col("doc_id") % 2 == 0, 8).otherwise(16).cast("bigint")
    be = lambda col, nbytes: F.lpad(F.hex(col), 2 * nbytes, "0")
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),      # signature
        F.lit("0000000D"),              # IHDR length 13
        F.lit("49484452"),              # 'IHDR'
        be(w, 4), be(h, 4), be(depth, 1),
        F.lit("02"),                    # color type 2 (RGB)
        F.lit("000000"),                # compression/filter/interlace
    )
    jpeg_hex = F.lit("FFD8FFE0" + "00" * 22)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(
            F.when(F.col("doc_id") % 6 == 0, jpeg_hex).otherwise(png_hex)
        ).alias("content"),
    )
    return png_header_meta(media)


@register(
    "d4_dedup_index_ingest",
    oracle=r"""
    WITH n AS (
      SELECT doc_id,
             sha256(trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_sha,
             doc_id % 3 AS b
      FROM documents),
    fb AS (
      SELECT norm_sha, min(b) AS first_seen_batch FROM n GROUP BY norm_sha)
    SELECT n.norm_sha,
           CAST(min(n.doc_id) AS BIGINT) AS keep_doc_id,
           CAST(fb.first_seen_batch AS BIGINT) AS first_seen_batch
    FROM n JOIN fb
      ON n.norm_sha = fb.norm_sha AND n.b = fb.first_seen_batch
    GROUP BY n.norm_sha, fb.first_seen_batch
    """,
    doc="D4 (persisted dedup index): the incremental-ingest deployment "
    "shape MADE REAL — a bucketed on-disk digest index "
    "(operators/dedup.py:update_dedup_index over sources/merge.py's "
    "xxhash64-bucketed table with `_COMMIT` marker) is built by "
    "ingesting the corpus in THREE successive batches (doc_id%3 in "
    "order 0,1,2): per drop, the batch is digested and collapsed "
    "(shuffle sized by the batch), LEFT-ANTI-screened against the "
    "index, and only genuinely-new digests MERGE in — rewrite cost "
    "follows new content, never index size. The oracle states the "
    "first-arrival-wins invariant in closed form (earliest batch "
    "containing a digest contributes its keeper), so the driver "
    "verifies the MULTI-STEP stateful sequence end-to-end, not one "
    "query: any crash-healing or merge bug that corrupted the index "
    "across ingests would hash-mismatch here.",
)
def d4_dedup_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspark.sql import functions as F

    from citydata_etl_spark.sources.merge import read_bucketed_control
    from citydata_etl_spark.util import session_tmpdir

    tag = os.path.basename(os.path.normpath(sf_dir))
    root = session_tmpdir(f"d4_dedupidx_{tag}")
    path = root + "/index"
    done = root + "/.ingested"
    if not os.path.exists(done):
        docs = read_testdata(spark, sf_dir, "documents")
        for b in range(3):
            D.update_dedup_index(
                spark, path, docs.filter(F.col("doc_id") % 3 == b),
                batch_no=b,
            )
        open(done, "w").close()
    return read_bucketed_control(spark, path).select(
        "norm_sha", "keep_doc_id", "first_seen_batch"
    )


@register(
    "d4_embed_project",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5)
                         AS BIGINT)) AS xi
      FROM embeddings),
    e AS (
      SELECT vec_id, p - 1 AS i, xi[CAST(p AS INT)] AS v
      FROM x, UNNEST(range(1, len(xi) + 1)) AS t(p))
    SELECT vec_id, CAST(j AS BIGINT) AS proj_idx,
           CAST(sum(v * (1 - 2 * (((i * 2654435761 + j * 40503 + 7)
                                   % 2147483647) % 2))) AS BIGINT)
             AS y_micros
    FROM e, UNNEST(range(8)) AS r(j)
    GROUP BY vec_id, j
    """,
    doc="D4 (dimensionality reduction): Johnson-Lindenstrauss sparse sign "
    "random projection, 64 -> 8 dims (Achlioptas 2003) — the cheapening "
    "step before ANN/clustering when the embedding dim dominates cost. "
    "No stored projection matrix: the sign is an integer-LCG function "
    "of (dim, output) indices, so every executor derives the identical "
    "projection with zero coordination or broadcast "
    "(operators/similarity.py:project_embeddings). Integer-micros "
    "accumulation makes the sums order-free and bit-exact across "
    "engines (a double accumulation would be neither oracle-exact nor "
    "invariant to partition order). Per-row codegen, zero exchanges.",
)
def d4_embed_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    return S.project_embeddings(emb, k=8)


@register(
    "d5_jpeg_meta",
    oracle="""
    WITH params AS (
      SELECT doc_id AS media_id,
             16 + doc_id % 2000 AS w,
             16 + (doc_id * 13) % 1000 AS h,
             doc_id % 4 = 0 AS prog,
             doc_id % 6 = 0 AS is_png,
             doc_id % 5 = 2 AS no_exif
      FROM documents)
    SELECT media_id,
           CASE WHEN is_png THEN NULL ELSE w END AS width,
           CASE WHEN is_png THEN NULL ELSE h END AS height,
           CASE WHEN is_png THEN NULL ELSE CAST(8 AS BIGINT) END
             AS precision,
           CASE WHEN is_png THEN NULL ELSE CAST(3 AS BIGINT) END
             AS n_components,
           CASE WHEN is_png THEN NULL ELSE prog END AS progressive,
           CASE WHEN is_png OR no_exif THEN NULL
                ELSE CAST(1 + media_id % 8 AS BIGINT) END AS orientation
    FROM params
    """,
    doc="D5 [north-star multimodal]: JPEG frame-header extraction — "
    "unlike PNG's fixed-offset IHDR (d5_png_meta, pure codegen), a "
    "JPEG's SOF marker sits behind a VARIABLE number of length-prefixed "
    "segments, so the parser is a bounded marker walk in an "
    "Arrow-batched mapInPandas (operators/multimodal.py:jpeg_header_"
    "meta) — the honest boundary where codegen ends. Blobs are "
    "synthesized with genuine JPEG syntax (SOI, JFIF APP0, an APP1 "
    "EXIF segment, a COM segment whose doc_id-dependent length SHIFTS "
    "the SOF offset, then SOF0 or SOF2) so the oracle states every "
    "field in closed form; every 6th row is a PNG that must yield "
    "NULLs. Since r14 the walk also surfaces EXIF ORIENTATION "
    "(tag 0x0112 — the r13 VERDICT gap: mis-oriented phone-camera "
    "frames silently corrupt vision corpora): the APP1 carries a "
    "spec-assembled TIFF IFD0 alternating LITTLE-endian (II) and "
    "BIG-endian (MM) byte orders by row with a two-entry IFD the "
    "parser must actually scan, orientation cycling 1..8, and every "
    "5th-mod-2 row omits EXIF entirely -> NULL orientation with SOF "
    "columns intact. The dominant-web-format triage: resolution / "
    "progressive / rotation filters over a 100 TB crawl with zero "
    "codec dependencies.",
)
def d5_jpeg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.multimodal import jpeg_header_meta

    docs = _spread_blob_feed(
        read_testdata(spark, sf_dir, "documents").select("doc_id")
    )
    d = F.col("doc_id")
    w = (16 + d % 2000).cast("bigint")
    h = (16 + (d * 13) % 1000).cast("bigint")

    def be2(c):  # 2-byte big-endian hex
        return F.lpad(F.hex(c), 4, "0")

    # spec-assembled EXIF APP1: "Exif\0\0" + TIFF header + a 2-entry
    # IFD0 (0x0112 Orientation SHORT=1+d%8, 0x0213 YCbCrPositioning),
    # alternating II/MM byte order by row; SHORT values sit
    # left-justified in the 4-byte value field per TIFF 6.0
    orient = F.lpad(F.hex(1 + d % 8), 2, "0")
    exif_ii = F.concat(
        F.lit("FFE1002E" "457869660000"),
        F.lit("49492A00" "08000000" "0200"),
        F.lit("1201" "0300" "01000000"), orient, F.lit("000000"),
        F.lit("1302" "0300" "01000000" "01000000"),
        F.lit("00000000"),
    )
    exif_mm = F.concat(
        F.lit("FFE1002E" "457869660000"),
        F.lit("4D4D002A" "00000008" "0002"),
        F.lit("0112" "0003" "00000001" "00"), orient, F.lit("0000"),
        F.lit("0213" "0003" "00000001" "00010000"),
        F.lit("00000000"),
    )
    jpeg_hex = F.concat(
        F.lit("FFD8"),                                    # SOI
        F.lit("FFE00010" "4A46494600" "0101" "00"
              "0001" "0001" "0000"),                      # JFIF APP0
        F.when(d % 5 == 2, F.lit(""))                     # no EXIF
         .when(d % 2 == 0, exif_ii).otherwise(exif_mm),
        F.lit("FFFE"), be2(d % 9 + 2),                    # COM, variable len
        F.expr("repeat('41', CAST(doc_id % 9 AS INT))"),  # COM filler
        F.when(d % 4 == 0, F.lit("FFC2")).otherwise(F.lit("FFC0")),
        F.lit("0011"), F.lit("08"), be2(h), be2(w), F.lit("03"),
        F.lit("011100" "021101" "031101"),                # component specs
    )
    png_hex = F.lit("89504E470D0A1A0A" + "00" * 40)
    media = docs.select(
        d.alias("media_id"),
        F.unhex(
            F.when(d % 6 == 0, png_hex).otherwise(jpeg_hex)
        ).alias("content"),
    )
    return jpeg_header_meta(media)


@register(
    "d4_dedup_report",
    oracle="""
    WITH g AS (
      SELECT text, min(doc_id) AS canonical_id, count(*) AS n_copies
      FROM documents GROUP BY text),
    per_doc AS (
      SELECT d.doc_id, d.source,
             g.n_copies > 1 AS is_duplicated,
             d.doc_id <> g.canonical_id AS is_loser
      FROM documents d JOIN g ON d.text = g.text)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN is_duplicated THEN 1 ELSE 0 END) AS BIGINT)
             AS n_in_dup_groups,
           CAST(sum(CASE WHEN is_loser THEN 1 ELSE 0 END) AS BIGINT)
             AS n_would_drop,
           CAST((sum(CASE WHEN is_loser THEN 1 ELSE 0 END) * 10000)
             // count(*) AS BIGINT) AS drop_bp
    FROM per_doc GROUP BY source
    """,
    doc="D4 (dedup observability): the per-source DEDUP REPORT — how much "
    "of each source sits in exact-duplicate groups and how much a "
    "keep-min-id dedup would drop (exact basis points). This is the "
    "audit that decides WHERE dedup budget goes at 100 TB (a source "
    "with 40% drop rate is a crawler bug, not a corpus): one content "
    "groupBy (at scale: on sha2, the d4_exact_dedup note) + one "
    "source-keyed aggregate; exact integer shares keep it hash-stable.",
)
def d4_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = read_testdata(spark, sf_dir, "documents")
    g = D.exact_dedup(docs)  # (text, canonical_id, n_dups)
    per_doc = docs.select("doc_id", "source", "text").join(g, "text")
    dup = (F.col("n_dups") > 1).cast("bigint")
    loser = (F.col("doc_id") != F.col("canonical_id")).cast("bigint")
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(dup).cast("bigint").alias("n_in_dup_groups"),
        F.sum(loser).cast("bigint").alias("n_would_drop"),
        F.expr(
            "(sum(CAST(doc_id <> canonical_id AS BIGINT)) * 10000)"
            " div count(*)"
        ).alias("drop_bp"),
    )


@register(
    "d4_url_dedup",
    oracle=r"""
    WITH u AS (
      SELECT doc_id,
             'https://' ||
             CASE WHEN doc_id % 3 = 0
                  THEN 'WWW.News' || (doc_id % 40) || '.Example.COM'
                  ELSE 'news' || (doc_id % 40) || '.example.com' END ||
             CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
             '/article/' || (doc_id % 25) || '?' ||
             CASE WHEN doc_id % 2 = 0
                  THEN 'utm_source=feed&id=' || (doc_id % 25) || '&ref=home'
                  ELSE 'id=' || (doc_id % 25) || '&ref=home' END ||
             CASE WHEN doc_id % 5 = 0 THEN '#sec' || (doc_id % 7) ELSE '' END
               AS url
      FROM documents),
    nf AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM u),
    parts AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(
               lower(regexp_extract(nofrag, '^https://([^/?#]+)', 1)),
               '^www\.', ''), ':443$', '') AS auth,
             regexp_extract(nofrag, '^https://[^/?#]+([^?#]*)', 1) AS path,
             array_to_string(list_sort(list_filter(
               string_split(regexp_extract(nofrag, '\?(.*)$', 1), '&'),
               x -> x <> '' AND x[1:4] <> 'utm_')), '&') AS q
      FROM nf)
    SELECT 'https://' || auth || path ||
           CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canonical_url,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM parts
    GROUP BY 1
    """,
    doc="D4 (crawl URL dedup): canonical-URL deduplication — the stage "
    "BEFORE content dedup in a crawl pipeline: the same resource "
    "re-fetched under case-variant hosts, www prefixes, explicit "
    "default ports, utm_* tracking params, reordered query params, or "
    "fragments collapses to one canonical key "
    "(functions/scalar.py:canonicalize_url — pure codegen regexp/array "
    "HOFs, folded into the scan projection). URLs are synthesized "
    "deterministically from doc_id with all six noise classes so the "
    "oracle replays the identical canonicalization in SQL; dedup is "
    "then one hash groupBy on the canonical key — at 100 TB the "
    "cheapest dedup pass there is (key width ~100 bytes, no content "
    "reads), which is why crawlers run it FIRST.",
)
def d4_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.functions.scalar import canonicalize_url

    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(
            d % 3 == 0,
            F.concat(F.lit("WWW.News"), d % 40, F.lit(".Example.COM")),
        ).otherwise(
            F.concat(F.lit("news"), d % 40, F.lit(".example.com"))
        ),
        F.when(d % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/article/"), d % 25, F.lit("?"),
        F.when(
            d % 2 == 0,
            F.concat(F.lit("utm_source=feed&id="), d % 25, F.lit("&ref=home")),
        ).otherwise(F.concat(F.lit("id="), d % 25, F.lit("&ref=home"))),
        F.when(
            d % 5 == 0, F.concat(F.lit("#sec"), d % 7)
        ).otherwise(F.lit("")),
    )
    docs = read_testdata(spark, sf_dir, "documents").select(
        "doc_id", url.alias("url")
    )
    return (
        docs.select("doc_id", canonicalize_url("url").alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


@register(
    "d4_line_dedup",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents),
    seg AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos,
             array_to_string(
               words[(CAST(i AS INTEGER)*4+1):(CAST(i AS INTEGER)*4+4)],
               ' ') AS line
      FROM w, UNNEST(range(0, CAST(ceil(len(words)/4.0) AS BIGINT))) AS t(i)),
    flagged AS (
      SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1
               AS keep
      FROM seg)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
                               ORDER BY pos), '') AS kept_text
    FROM flagged GROUP BY doc_id
    """,
    doc="D4 (corpus line dedup): duplicate-LINE removal with document "
    "reassembly — the CCNet/RefinedWeb stage that runs BEFORE document "
    "MinHash (Wenzek 2020 §4.1; Penedo 2023): every occurrence of a line "
    "beyond its first across the WHOLE corpus is dropped and survivors "
    "are stitched back per document (operators/dedup.py:dedup_lines). "
    "Lines are fixed 4-word windows (fixture text has no newlines; a "
    "real corpus splits on newline — the pipeline after segmentation is "
    "identical). First occurrence = min (doc_id, pos) via ONE row_number "
    "window partitioned by the line; reassembly sorts kept (pos, line) "
    "structs inside the per-doc aggregate. Two exchanges total (line "
    "hash, then doc id), zero joins; docs losing every line still emit "
    "n_kept=0 with empty text, so the output is total over input docs.",
)
def d4_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.dedup import dedup_lines

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup_lines(docs, words_per_line=4)


@register(
    "d5_audio_energy",
    oracle="""
    WITH params AS (
      SELECT doc_id AS media_id, 200 + doc_id % 300 AS n
      FROM documents WHERE doc_id % 9 <> 0),
    samp AS (
      SELECT media_id, CAST(i AS BIGINT) AS si,
             (media_id * 31 + CAST(i AS BIGINT) * 17) % 4096 AS s
      FROM params, UNNEST(range(0, n)) AS t(i))
    SELECT media_id, CAST(si // 128 AS INT) AS win_idx,
           CAST(count(*) AS INT) AS n_samples,
           CAST(sum(s * s) AS BIGINT) AS energy
    FROM samp GROUP BY media_id, si // 128
    """,
    doc="D5 [north-star multimodal]: per-window audio ENERGY from raw "
    "16-bit PCM WAV payloads — the step PAST header triage: silence/"
    "loudness gating runs on exactly this signal before any model sees "
    "the audio (operators/multimodal.py:audio_energy_windows). The "
    "operator genuinely PARSES bytes: header validation, then "
    "numpy.frombuffer('<i2') over the payload inside Arrow-batched "
    "mapInPandas, exact integer sum(s^2) per 128-sample window (int64 "
    "— no float summation order to disagree about). Blobs are complete "
    "WAV files synthesized in codegen (canonical 44-byte header + LE "
    "PCM samples s_i = (doc_id*31 + i*17) % 4096; every 9th row a PNG "
    "stub that must emit NO windows), so the oracle states every "
    "window's energy in closed form — the parse-and-compute path must "
    "reproduce the generator formula bit-exactly, partial final window "
    "included. The parser is additionally pinned against Python's wave "
    "module on real bytes in tests/test_multimodal.py.",
)
def d5_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.multimodal import audio_energy_windows

    docs = _spread_blob_feed(
        read_testdata(spark, sf_dir, "documents").select("doc_id")
    )
    d = F.col("doc_id")
    n_samples = (200 + d % 300).cast("bigint")
    data_bytes = n_samples * 2
    wav_header_hex = F.concat(
        F.lit("52494646"), _le_hex(data_bytes + 36, 4),   # 'RIFF' + size
        F.lit("57415645"), F.lit("666D7420"),             # 'WAVE' 'fmt '
        _le_hex(F.lit(16).cast("bigint"), 4),             # fmt chunk size
        _le_hex(F.lit(1).cast("bigint"), 2),              # PCM
        _le_hex(F.lit(1).cast("bigint"), 2),              # mono
        _le_hex(F.lit(8000).cast("bigint"), 4),           # sample rate
        _le_hex(F.lit(16000).cast("bigint"), 4),          # byte rate
        _le_hex(F.lit(2).cast("bigint"), 2),              # block align
        _le_hex(F.lit(16).cast("bigint"), 2),             # bits/sample
        F.lit("64617461"), _le_hex(data_bytes, 4),        # 'data' + size
    )
    payload_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), n_samples - 1),
            lambda i: F.concat(
                F.lpad(
                    F.hex(((d * 31 + i * 17) % 4096).bitwiseAND(F.lit(255))),
                    2, "0",
                ),
                F.lpad(
                    F.hex(F.shiftright((d * 31 + i * 17) % 4096, 8)), 2, "0"
                ),
            ),
        ),
        "",
    )
    png_hex = F.lit("89504E470D0A1A0A" + "00" * 36)
    media = docs.select(
        d.alias("media_id"),
        F.unhex(
            F.when(d % 9 == 0, png_hex).otherwise(
                F.concat(wav_header_hex, payload_hex)
            )
        ).alias("content"),
    )
    return audio_energy_windows(media, window_samples=128)


@register(
    "d4_containment",
    oracle="""
    WITH tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 3, 1) + 1)) AS i
      FROM tokl),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 3 AS INT)], ' ')
               AS shingle
      FROM idx),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b)
    SELECT doc_a, doc_b,
           round(CAST(i AS DOUBLE) / least(sa.sz, sb.sz), 6) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / least(sa.sz, sb.sz) >= 0.6
    """,
    doc="D4 (asymmetric containment): exact bigram set-CONTAINMENT pairs "
    "|A∩B| / min(|A|,|B|) >= 0.6 (Broder 1997's C(A,B)) — the signal "
    "Jaccard misses: a short quote or boilerplate block embedded in a "
    "much longer doc has near-zero Jaccard but containment ~1 "
    "(operators/dedup.py:containment_pairs). Blocking is lossless by "
    "pigeonhole on the SMALLER side: its rarity prefix must hit the "
    "other side's FULL inverted index (prefix x prefix, Jaccard's "
    "trick, is unsound here — the long side's prefix bound never "
    "reaches a small overlap); exact array_intersect verify. Shingles "
    "are 4-grams (Broder used 10): on a small-vocabulary corpus even "
    "the RAREST bigram is document-frequent, which inflates the "
    "prefix-x-index candidate set ~200x (measured at sf0.1) — longer "
    "grams are the standard containment fix, and the 4-gram set "
    "derives free from the sweep-shared dup-passage shingle bag. "
    "Equality to the naive inverted-index join pinned by a property "
    "test.",
)
def d4_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.sources.readers import read_doc_shingle_set

    docs = read_testdata(spark, sf_dir, "documents")
    return D.containment_pairs(
        docs, n=4, threshold=0.6,
        shingle_rel=read_doc_shingle_set(spark, sf_dir, 4),
    )


@register(
    "d4_collocations",
    oracle="""
    WITH tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    uni AS (
      SELECT t.tok AS w, count(*) AS c
      FROM tokl, UNNEST(toks) AS t(tok) GROUP BY t.tok),
    bi AS (
      SELECT toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2,
             count(*) AS c_xy
      FROM tokl, UNNEST(range(1, greatest(len(toks) - 1, 0) + 1)) AS t(i)
      GROUP BY w1, w2),
    tot AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM bi)
    SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
           CAST((c_xy * n * 1000000) // (u1.c * u2.c) AS BIGINT) AS lift_ppm
    FROM bi, tot
    JOIN uni u1 ON u1.w = w1
    JOIN uni u2 ON u2.w = w2
    WHERE c_xy >= 5
    ORDER BY lift_ppm DESC, w1, w2
    LIMIT 50
    """,
    doc="D4 (collocation mining): top bigram collocations by exact "
    "integer LIFT — P(xy)/(P(x)P(y)) stated as (c_xy * N * 10^6) div "
    "(c_x * c_y), so the association score is engine-exact with no "
    "logarithm (PMI's log only monotonically rescales lift; ranking is "
    "identical and the transcendental ulp hazard disappears). The "
    "phrase-detection pass tokenizer pipelines run before merging "
    "multiword units. Engine shape: two map-side-combined counts "
    "(unigram, bigram), two equi-joins of the bigram relation against "
    "the unigram counts (AQE broadcasts when the vocabulary is small), "
    "one bounded 1-row total broadcast, TakeOrderedAndProject top-50 "
    "with full tie-break. Overflow bound: c_xy * N * 10^6 < 2^63 up to "
    "~10^9 total bigrams; shard the count beyond that.",
)
def d4_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = read_testdata(spark, sf_dir, "documents")
    toks = docs.select(
        F.filter(F.split("text", " "), lambda w: w != "").alias("toks")
    )
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    # guard the under-2-token doc: sequence(0, -1) is the DESCENDING
    # [0, -1] in Spark (never empty), which would mint (token, NULL)
    # phantom bigrams that inflate the total N before the uni joins
    # could drop them — same guard as d4_bpe_pair_counts
    idx = F.when(
        F.size("toks") >= 2,
        F.sequence(F.lit(0), F.size("toks") - 2),
    ).otherwise(F.array().cast("array<int>"))
    bi = (
        toks.select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.get("toks", i).alias("w1"),
                        F.get("toks", i + 1).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
    )
    tot = bi.agg(F.sum("c_xy").cast("bigint").alias("n"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    num = F.col("c_xy") * F.col("n") * 1000000
    den = F.col("c1") * F.col("c2")
    return (
        bi.filter(F.col("c_xy") >= 5)
        .crossJoin(F.broadcast(tot))
        .join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1", "w2", F.col("c_xy").cast("bigint").alias("c_xy"),
            ((num - num % den) / den).cast("bigint").alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "w1", "w2")
        .limit(50)
    )


@register(
    "d5_mp4_meta",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             1000 + doc_id % 9000 AS ts,
             (doc_id * 37) % 100000 AS dur,
             doc_id % 6 = 0 AS not_mp4,
             CASE doc_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
                             ELSE 'avc1' END AS brand
      FROM documents)
    SELECT media_id,
           CASE WHEN not_mp4 THEN NULL ELSE brand END AS major_brand,
           CASE WHEN not_mp4 THEN NULL ELSE CAST(ts AS BIGINT) END
             AS timescale,
           CASE WHEN not_mp4 THEN NULL ELSE CAST(dur AS BIGINT) END
             AS duration,
           CASE WHEN not_mp4 THEN NULL
                ELSE CAST(dur * 1000 // ts AS BIGINT) END AS duration_ms
    FROM p
    """,
    doc="D5 [north-star multimodal]: MP4/ISO-BMFF container metadata — "
    "major brand, movie timescale, duration — completing the "
    "image (d5_png_meta, d5_jpeg_meta) / audio (d5_wav_meta, "
    "d5_audio_energy) / VIDEO triage triad. Boxes are length-prefixed "
    "with three size encodings (32-bit, largesize, to-EOF) and moov "
    "commonly trails an arbitrarily large mdat, so the parser is a "
    "bounded two-level box walk in Arrow-batched mapInPandas "
    "(operators/multimodal.py:mp4_header_meta), not codegen. Blobs are "
    "synthesized with genuine BMFF syntax: ftyp, a doc_id-dependent "
    "free box that SHIFTS the moov offset (the walk is provably real), "
    "then moov>mvhd alternating version 0 (32-bit) and version 1 "
    "(64-bit) layouts; every 6th row is a PNG that must yield NULLs. "
    "The oracle states every field in closed form. At 100 TB this is "
    "the duration/brand prefilter before frame sampling — header-only "
    "reads, zero codec dependencies.",
)
def d5_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.multimodal import mp4_header_meta

    docs = _spread_blob_feed(
        read_testdata(spark, sf_dir, "documents").select("doc_id")
    )
    d = F.col("doc_id")
    ts = (1000 + d % 9000).cast("bigint")
    dur = ((d * 37) % 100000).cast("bigint")

    def be4(c):
        return F.lpad(F.hex(c), 8, "0")

    def be8(c):
        return F.lpad(F.hex(c), 16, "0")

    brand = (
        F.when(d % 3 == 0, F.lit("isom"))
        .when(d % 3 == 1, F.lit("mp42"))
        .otherwise(F.lit("avc1"))
    )
    ftyp = F.concat(
        be4(F.lit(24)), F.hex(F.lit("ftyp")), F.hex(brand),
        be4(F.lit(0)), F.hex(F.lit("isommp41")),
    )
    pad = (d % 13).cast("int")
    free = F.concat(
        be4(F.lit(8) + pad), F.hex(F.lit("free")),
        F.expr("repeat('00', CAST(doc_id % 13 AS INT))"),
    )
    mvhd0 = F.concat(
        be4(F.lit(108)), F.hex(F.lit("mvhd")), F.lit("00000000"),
        be4(F.lit(0)), be4(F.lit(0)), be4(ts), be4(dur),
        F.lit("00" * 80),
    )
    mvhd1 = F.concat(
        be4(F.lit(120)), F.hex(F.lit("mvhd")), F.lit("01000000"),
        be8(F.lit(0)), be8(F.lit(0)), be4(ts), be8(dur),
        F.lit("00" * 80),
    )
    moov = F.when(
        d % 5 == 0, F.concat(be4(F.lit(8 + 120)), F.hex(F.lit("moov")), mvhd1)
    ).otherwise(
        F.concat(be4(F.lit(8 + 108)), F.hex(F.lit("moov")), mvhd0)
    )
    mp4_hex = F.concat(ftyp, free, moov)
    png_hex = F.lit("89504E470D0A1A0A" + "00" * 16)
    media = docs.select(
        d.alias("media_id"),
        F.unhex(F.when(d % 6 == 0, png_hex).otherwise(mp4_hex)).alias(
            "content"
        ),
    )
    return mp4_header_meta(media)


@register(
    "d5_tar_meta",
    oracle="""
    WITH m AS (
      SELECT doc_id % 8 AS shard_id, doc_id,
             'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS name,
             CAST(octet_length(encode(text)) AS BIGINT) AS size
      FROM documents)
    SELECT CAST(shard_id AS BIGINT) AS shard_id, name, size,
           CAST(coalesce(sum(512 + ((size + 511) // 512) * 512)
                  OVER (PARTITION BY shard_id ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0)
                + 512 AS BIGINT) AS data_offset
    FROM m
    """,
    doc="D5 [north-star multimodal]: tar shard member listing — the "
    "WebDataset access pattern: multimodal corpora ship as tar files "
    "of per-sample members, and every reader first needs (name, size, "
    "byte offset) per member WITHOUT unpacking, so a ranged GET can "
    "fetch exactly one sample from object storage. The entry BUILDS "
    "real ustar archives (8 shards over documents, Python tarfile in "
    "applyInPandas with pinned metadata — the producer half of the "
    "WebDataset pipeline), then the OPERATOR walks 512-byte headers "
    "with CHECKSUM VERIFICATION (operators/multimodal.py:tar_members "
    "— a misaligned walk cannot hallucinate members from payload "
    "bytes). The oracle states the full member index in closed form: "
    "ustar layout means data_offset is a prefix sum of 512-padded "
    "member blocks + one header — so the driver verifies the byte "
    "math of the walk, not just row counts. Both halves are "
    "Arrow-batched; per-shard cost is linear in the shard.",
)
def d5_tar_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    import io
    import tarfile

    import pandas as pd

    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.multimodal import tar_members

    docs = read_testdata(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 8).alias("shard_id"), "doc_id", "text"
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bio = io.BytesIO()
        # USTAR_FORMAT pins plain 512-byte headers (the default PAX
        # format would interleave extended-header records and shift
        # every offset); metadata zeroed for bit-determinism
        with tarfile.open(
            fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT
        ) as tf:
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                data = str(text).encode("utf-8")
                ti = tarfile.TarInfo(name=f"doc_{did}.txt")
                ti.size = len(data)
                ti.mtime = 0
                ti.mode = 0o644
                tf.addfile(ti, io.BytesIO(data))
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "content": [bio.getvalue()],
            }
        )

    shards = docs.groupBy("shard_id").applyInPandas(
        build, schema="shard_id BIGINT, content BINARY"
    )
    return tar_members(shards)


def _bmp_media_fixture(
    spark: SparkSession, sf_dir: str, plant_dups: bool = False
) -> DataFrame:
    """Shared BMP blob fixture for d5_bmp_pixels / d5_bmp_resize: genuine
    24-bpp BMPs with closed-form pixels, dims cycling by doc_id, both
    storage orientations (every 5th top-down), live stride padding, and
    a PNG every 7th row. With plant_dups, every 11th image (id > 0) is
    the BYTE-IDENTICAL copy of its predecessor's image (same pixel id
    throughout — the planted ground truth for image near-dup pairing).
    Per-pixel Python over <=48-px images — synthesis only; the
    OPERATORS decode vectorized."""
    import pandas as pd

    docs = _spread_blob_feed(
        read_testdata(spark, sf_dir, "documents").select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                d = int(did)
                ids.append(d)
                if plant_dups and d % 11 == 0 and d > 0:
                    d = d - 1  # duplicate the predecessor's image
                if d % 7 == 0:
                    blobs.append(
                        bytes.fromhex("89504E470D0A1A0A") + b"\x00" * 46
                    )
                    continue
                w, h = 4 + d % 5, 3 + d % 4
                topdown = d % 5 == 0
                stride = (w * 3 + 3) // 4 * 4
                body = bytearray()
                yorder = range(h) if topdown else range(h - 1, -1, -1)
                for y in yorder:
                    row = bytearray()
                    for x in range(w):
                        row.append((d + 3 * x + 7 * y) % 256)
                        row.append((2 * d + 5 * x + 11 * y + 1) % 256)
                        row.append((3 * d + x + 13 * y + 2) % 256)
                    row.extend(b"\x00" * (stride - len(row)))
                    body.extend(row)
                header = (
                    b"BM"
                    + (54 + len(body)).to_bytes(4, "little")
                    + b"\x00\x00\x00\x00"
                    + (54).to_bytes(4, "little")
                    + (40).to_bytes(4, "little")
                    + w.to_bytes(4, "little", signed=True)
                    + (-h if topdown else h).to_bytes(
                        4, "little", signed=True
                    )
                    + (1).to_bytes(2, "little")
                    + (24).to_bytes(2, "little")
                    + (0).to_bytes(4, "little")
                    + len(body).to_bytes(4, "little")
                    + b"\x00" * 16
                )
                blobs.append(bytes(header) + bytes(body))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return docs.mapInPandas(build, schema="media_id BIGINT, content BINARY")


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG Paeth predictor (RFC 2083 §6.6) over reconstructed
    left/up/up-left bytes — shared by the fixture's forward filter
    and the tests' Python model."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(px_rows, channels: int, filters, split_idat: bool = False,
               interlace: bool = False, palette=None, depth: int = 8):
    """Encode a genuine PNG from raw pixel rows (list of rows, each a
    flat list of channel SAMPLES in [0, 2**depth)), applying the
    given per-row filter types FORWARD (enc = raw - predictor mod
    256, over the PACKED bytes) so the decoder must actually reverse
    them. channels: 1 (grayscale, color type 0), 2 (gray+alpha,
    type 4), 3 (RGB, type 2) or 4 (RGBA, type 6).
    `palette` (a list of (r, g, b) tuples, <= 256) switches to
    palette-indexed (color type 3): channels must be 1, rows carry
    palette INDICES, and a PLTE chunk is emitted after IHDR.
    `depth` (1/2/4/8/16, spec-legal combos only): 16-bit samples pack
    big-endian two bytes each; sub-byte samples pack MSB-first with
    zero padding at each packed row's end — filter byte offset is
    max(1, channels*depth//8) exactly as the decoder reverses it.
    split_idat=True emits the compressed stream as TWO IDAT chunks —
    decoders must concatenate before inflating. interlace=True emits
    Adam7: the seven passes (geometry shared with the decoder via
    multimodal._ADAM7_PASSES) are extracted on the (x0 + j*dx,
    y0 + i*dy) grids IN SAMPLE SPACE (each pass packs its own rows,
    so sub-byte padding lands per pass) and each pass is filtered as
    an INDEPENDENT sub-image (predictors reset per pass); `filters`
    then indexes the emitted scanlines in pass order. Synthesis-only
    per-byte Python over <=48-px images; the OPERATOR decodes
    vectorized (operators/multimodal.py:_decode_png_rgb)."""
    import zlib

    from citydata_etl_spark.operators.multimodal import _ADAM7_PASSES

    assert depth in (1, 2, 4, 8, 16)
    if depth < 8:
        assert channels == 1  # gray or palette only, per spec
    if palette is not None:
        assert depth <= 8
    h = len(px_rows)
    stride = len(px_rows[0])
    w = stride // channels
    bpp = max(1, channels * depth // 8)  # filter byte offset
    raw = bytearray()
    n_emitted = [0]  # scanline counter across passes, indexes filters

    def pack_row(srow):
        """Sample row -> packed scanline bytes at this depth."""
        if depth == 8:
            return list(srow)
        if depth == 16:
            out = []
            for s in srow:
                out += [s >> 8, s & 0xFF]
            return out
        out, acc, nb = [], 0, 0
        for s in srow:
            acc = (acc << depth) | s
            nb += depth
            if nb == 8:
                out.append(acc)
                acc = nb = 0
        if nb:
            out.append(acc << (8 - nb))
        return out

    def emit_subimage(rows):
        rows = [pack_row(r) for r in rows]
        prev = [0] * len(rows[0])
        for row in rows:
            f = filters[n_emitted[0]]
            n_emitted[0] += 1
            raw.append(f)
            for x in range(len(row)):
                left = row[x - bpp] if x >= bpp else 0
                up = prev[x]
                upleft = prev[x - bpp] if x >= bpp else 0
                if f == 0:
                    enc = row[x]
                elif f == 1:
                    enc = (row[x] - left) % 256
                elif f == 2:
                    enc = (row[x] - up) % 256
                elif f == 3:
                    enc = (row[x] - (left + up) // 2) % 256
                else:
                    enc = (row[x] - _paeth(left, up, upleft)) % 256
                raw.append(enc)
            prev = row

    if not interlace:
        emit_subimage([list(r) for r in px_rows])
    else:
        for x0, y0, dx, dy in _ADAM7_PASSES:
            sub = []
            for y in range(y0, h, dy):
                row = []
                for x in range(x0, w, dx):
                    row.extend(px_rows[y][x * channels:(x + 1) * channels])
                if row:
                    sub.append(row)
            if sub:
                emit_subimage(sub)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + crc.to_bytes(4, "big")
        )

    if palette is not None:
        assert channels == 1 and 1 <= len(palette) <= 256
        color_type = 3
    else:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([depth, color_type, 0, 0, 1 if interlace else 0])
    )
    comp = zlib.compress(bytes(raw))
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(c for rgb in palette for c in rgb))
    if split_idat and len(comp) > 2:
        mid = len(comp) // 2
        out += chunk(b"IDAT", comp[:mid]) + chunk(b"IDAT", comp[mid:])
    else:
        out += chunk(b"IDAT", comp)
    return out + chunk(b"IEND", b"")


def _gif_lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW encode of a palette-index stream: LSB-first
    variable-width codes, leading clear code, dictionary growth,
    clear+reset at the 4096-entry cap, trailing EOI. Synthesis-side
    twin of operators/multimodal.py:_gif_lzw_decode; the round-trip
    property test drives both across dict growth, width bumps, and
    the cap.

    Width schedule: the bump follows the CODES-WRITTEN counter with
    the decoder's exact giflib rule (widen once the counter passes
    1 << width) — NOT the table-add counter. The two counters agree
    mid-stream (every data emit but the last pairs with one table
    add) but diverge by one at the stream's FINAL no-add emission:
    when the last add lands next_code exactly on a power of two, the
    decoder widens for the closing code + EOI and a table-driven
    encoder would write them one bit narrow, producing a stream
    giflib-compatible decoders reject (found by hypothesis at
    n_sym=2, ln=31, repetitive=True — pinned as a regression)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    width = min_code_size + 1
    table: dict[tuple, int] = {}
    next_code = eoi + 1   # next free TABLE code (dict growth + cap)
    written = eoi + 1     # codes-written counter (width schedule)

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def emit_data(code):
        # Every non-clear/non-EOI code advances the width schedule —
        # mirror of the decoder's post-consume bump, so a clear or
        # EOI that follows is written at the width it will be read.
        nonlocal written, width
        emit(code)
        written += 1
        if written > (1 << width) and width < 12:
            width += 1

    def reset():
        nonlocal table, next_code, width, written
        table = {(i,): i for i in range(clear)}
        next_code = eoi + 1
        width = min_code_size + 1
        written = eoi + 1

    reset()
    emit(clear)
    idx = list(indices)
    w = (idx[0],)
    for k in idx[1:]:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit_data(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        else:
            emit(clear)
            reset()
        w = (k,)
    emit_data(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(px_rows, split_subblocks: bool = False,
               interlace: bool = False) -> bytes:
    """Encode a genuine GIF89a from raw pixel rows (list of rows, each
    a list of (r, g, b) tuples): palette built from colors in first-
    appearance order (<= 256 distinct required), REAL LZW-compressed
    index stream, data split into <=255-byte sub-blocks
    (split_subblocks forces small sub-blocks so decoders must join
    them). interlace=True stores rows in the GIF four-pass order
    (0 mod 8, 4 mod 8, 2 mod 4, odd) and sets the descriptor flag.
    Full-frame, global color table — exactly the profile
    _decode_gif_rgb supports."""
    h = len(px_rows)
    w = len(px_rows[0])
    stored_rows = px_rows
    if interlace:
        stored_rows = (
            [px_rows[y] for y in range(0, h, 8)]
            + [px_rows[y] for y in range(4, h, 8)]
            + [px_rows[y] for y in range(2, h, 4)]
            + [px_rows[y] for y in range(1, h, 2)]
        )
    palette: dict[tuple, int] = {}
    idx = []
    for row in stored_rows:
        for c in row:
            if c not in palette:
                palette[c] = len(palette)
            idx.append(palette[c])
    n = len(palette)
    assert n <= 256, "fixture palette overflow"
    bits = max(2, (n - 1).bit_length())
    gct_n = 1 << bits
    mcs = bits
    lzw = _gif_lzw_encode(idx, mcs)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (bits - 1))  # GCT flag + size
    out += b"\x00\x00"  # bg index, aspect
    for color, _i in sorted(palette.items(), key=lambda kv: kv[1]):
        out += bytes(color)
    out += b"\x00\x00\x00" * (gct_n - n)  # pad table to 2^bits
    # a skippable extension block (comment), exercising the walk
    out += b"\x21\xfe\x05fixed\x00"
    out += b"\x2c" + b"\x00\x00\x00\x00"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)  # no LCT; interlace flag
    out.append(mcs)
    step = 7 if split_subblocks else 255
    for s in range(0, len(lzw), step):
        chunk = lzw[s:s + step]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def jpeg_sa_scan_script(n_comp: int) -> list:
    """libjpeg's default progressive scan script
    (jcparam.c:jpeg_simple_progression) as (component indices, Ss,
    Se, Ah, Al) tuples — the successive-approximation +
    spectral-selection interleaving that MOST wild SOF2 files use:
    a DC first pass at Al=1, split luma AC first passes at Al=2, a
    luma AC refinement 2->1 spanning BOTH first-pass bands (the case
    that forces per-COEFFICIENT progression tracking), an interleaved
    DC refinement, and final Ah=1->Al=0 refinements for every
    component."""
    if n_comp == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    if n_comp == 3:
        return [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([1], 1, 63, 0, 1),
            ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([1], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    # other counts (4-component CMYK/YCCK): libjpeg's generic shape —
    # one interleaved DC first pass at Al=1, per-component AC first
    # passes at Al=1, the interleaved DC refinement, then
    # per-component AC refinements to Al=0
    all_c = list(range(n_comp))
    return (
        [(all_c, 0, 0, 0, 1)]
        + [([c], 1, 63, 0, 1) for c in all_c]
        + [(all_c, 0, 0, 1, 0)]
        + [([c], 1, 63, 1, 0) for c in all_c]
    )


def encode_jpeg(comp_blocks, w: int, h: int,
                restart_interval: int = 0, sampling=None,
                progressive: bool = False, scan_script=None,
                adobe_transform: int | None = None,
                exif_orientation: int | None = None,
                precision: int = 8,
                component_ids: list | None = None,
                arithmetic: bool = False) -> bytes:
    """Encode a GENUINE baseline-sequential JFIF JPEG from QUANTIZED
    coefficient blocks: real Huffman entropy coding (canonical tables
    emitted in DHT — all 12 DC categories at 4 bits, all 162 AC
    run/size symbols at 8 bits; spec-valid 'optimized tables', so the
    decoder must build codes from BITS/VALS rather than assume Annex
    K), DPCM DC differences, run-length AC with ZRL/EOB, 0xFF byte
    stuffing, optional DRI + RSTn restarts, flat quant table of 8s
    (table 0, shared). comp_blocks is a list of 1 (grayscale) or 3
    (YCbCr) lists of 8x8 integer matrices in NATURAL order, row-major
    over each component's OWN padded block grid — with the default
    1x1 sampling that is the ceil(w/8) x ceil(h/8) MCU grid.

    `sampling` is an optional per-component list of (h, v) factors in
    1..4 (default all (1, 1) = 4:4:4). With factors, component ci's
    grid is (mcuy*v_ci) rows x (mcux*h_ci) cols of blocks where
    mcux = ceil(w / (8*hmax)), mcuy = ceil(h / (8*vmax)), and the
    entropy stream interleaves v*h blocks per component per MCU in
    the T.81 raster order — ((2,2),(1,1),(1,1)) is 4:2:0 and
    ((2,1),(1,1),(1,1)) is 4:2:2, the profiles wild JPEGs actually
    use.

    Exactness: with the all-8s quant table, a DC-only block with code
    m decodes to the flat sample clamp(m + 128) exactly (dequantized
    DC = 8m, IDCT of a DC-only block = DC/8, +128 level shift), which
    is what makes the driver fixture's pixels closed-form in SQL —
    subsampled chroma then replicates each flat 8x8 chroma block over
    an aligned 16-pixel-wide (and/or tall) box.

    `progressive=True` emits SOF2 with the spectral-selection scan
    script (Ah = Al = 0): one interleaved DC scan (Ss=Se=0), then one
    AC scan per component (Ss=1, Se=63) over that component's OWN
    ceil(w_c/8) x ceil(h_c/8) block raster — MCU-padding blocks are
    never AC-coded — with runs of all-zero bands compressed as EOBn
    symbols (flushed before content blocks, before restarts, and at
    scan end; the AC table gains the EOB1..EOB14 symbols only in this
    mode, so baseline streams stay byte-identical). Same quantized
    coefficients -> same decoded pixels as the baseline encode.

    `arithmetic=True` (r16) emits SEQUENTIAL ARITHMETIC coding (SOF9)
    instead of Huffman: the T.81 Annex D QM coder (shared state table
    _QM_TABLE imported from the decoder module — one table, no drift)
    driven by the Annex F.1.4 DC/AC conditioning models, with an
    explicit DAC marker carrying the default conditioning (L=0, U=1,
    Kx=5), no DHT, per-restart-interval coder flush + statistics
    reset, and FF-stuffing as a transport post-pass. Carry resolution
    ripples +1 backward through the in-memory segment rather than
    tracking stacked FF counts — simpler, same bytes. Same quantized
    coefficients -> same decoded pixels as the Huffman encode (both
    entropy codings are lossless). Mutually exclusive with
    `progressive` (SOF10 is out of scope on both sides).

    `scan_script` (progressive only) overrides the default with a
    list of (component indices, Ss, Se, Ah, Al) scans adding
    SUCCESSIVE APPROXIMATION (T.81 G.1.2, new in r14): DC first
    scans code arithmetic-shifted values (dc >> Al) and DC
    refinements emit one raw magnitude bit ((dc >> Al) & 1) per
    block; AC first scans code the magnitude point transform
    (truncate toward zero, G.1.2.2); AC refinements follow the
    libjpeg jcphuff algorithm — newly-significant coefficients
    (|v| >> Al == 1) as run/1 symbols + sign bit where the run
    counts only zero-history positions, one buffered correction bit
    (|v| >> Al & 1) per already-significant coefficient emitted
    after the next symbol, ZRLs only while another newly-significant
    coefficient is ahead (zeros after the last one are EOB
    material), and EOB runs carrying the covered blocks' correction
    bits in block order. `jpeg_sa_scan_script(n_comp)` is libjpeg's
    default script. Any legal script with the same coefficients
    decodes to the same pixels as the baseline encode.
    Synthesis-side twin of operators/multimodal.py:_decode_jpeg_rgb;
    shares _JPEG_ZIGZAG with it so scan order cannot drift."""
    from citydata_etl_spark.operators.multimodal import _JPEG_ZIGZAG

    n_comp = len(comp_blocks)
    assert n_comp in (1, 3, 4)
    # 12-bit samples need extended sequential (SOF1) or progressive
    # (SOF2): baseline SOF0 is 8-bit by definition (T.81 4.11)
    assert precision in (8, 12)
    # arithmetic + progressive (r17): SOF10 — the Annex G.2 scan
    # kinds driven by the same QM coder/statistical models as SOF9
    # 4-component frames are Adobe CMYK (transform 0) or YCCK (2) and
    # MUST carry the APP14 marker the decoder keys its color model on;
    # 3-component frames may carry transform 0 (STORED RGB, r15) or 1
    # (explicit YCbCr); `component_ids` overrides the default 1..n cids
    # (e.g. [0x52, 0x47, 0x42] = the unmarked 'R','G','B' stored-RGB
    # signature libjpeg keys on when no APP14 is present)
    if n_comp == 4:
        assert adobe_transform in (0, 2)
    elif n_comp == 3:
        assert adobe_transform in (None, 0, 1)
    else:
        assert adobe_transform is None
    if component_ids is None:
        component_ids = [c + 1 for c in range(n_comp)]
    assert len(component_ids) == n_comp
    assert all(0 <= c <= 255 for c in component_ids)
    if sampling is None:
        sampling = [(1, 1)] * n_comp
    assert len(sampling) == n_comp
    assert all(1 <= sh <= 4 and 1 <= sv <= 4 for sh, sv in sampling)
    # T.81 A.2.2: a single-component scan is non-interleaved — the MCU
    # is ONE block and declared factors do not apply. The decoder
    # normalizes such frames to 1x1, so an encoder laying grayscale
    # blocks out on an MCU-tile grid would produce silently WRONG
    # pixel order (r13 self-review finding); refuse rather than drift.
    assert n_comp > 1 or sampling == [(1, 1)]
    hmax = max(sh for sh, _ in sampling)
    vmax = max(sv for _, sv in sampling)
    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0 only when the frame really is JFIF: libjpeg
    # (jdapimin.c) gives a JFIF marker PRECEDENCE over APP14 and
    # component-id guesses for 3-component frames, so emitting it on
    # an Adobe-transform or R,G,B-cid blob would contradict the color
    # model the blob declares (r16 ADVICE fix — previously every blob
    # carried JFIF unconditionally, making the stored-RGB fixtures
    # decode YCbCr under libjpeg). JFIF is also only defined for 1/3
    # components, so Adobe CMYK/YCCK drops it too.
    if adobe_transform is None and \
            component_ids == [c + 1 for c in range(n_comp)]:
        out += (b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00"
                b"\x01\x00\x00")
    if exif_orientation is not None:
        # APP1 EXIF: TIFF II header + a one-entry IFD0 carrying tag
        # 0x0112 (SHORT, left-justified value field per TIFF 6.0)
        assert 1 <= exif_orientation <= 8
        tiff = (b"II*\x00\x08\x00\x00\x00" + b"\x01\x00"
                + b"\x12\x01\x03\x00\x01\x00\x00\x00"
                + bytes([exif_orientation]) + b"\x00\x00\x00"
                + b"\x00\x00\x00\x00")
        payload = b"Exif\x00\x00" + tiff
        out += b"\xff\xe1" + (2 + len(payload)).to_bytes(2, "big") \
            + payload
    if adobe_transform is not None:
        # APP14 "Adobe" v100, flags 0, color-transform byte
        out += b"\xff\xee\x00\x0eAdobe\x00\x64\x00\x00\x00\x00" \
            + bytes([adobe_transform])
    # DQT: table 0, 8-bit precision, all 64 entries = 8 (zigzag order)
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([8] * 64)
    # SOF0 (baseline 8-bit) / SOF1 (extended sequential, 12-bit) /
    # SOF2 (progressive): precision, h x w, per-component sampling
    # factors, qtable 0
    sof = bytes([precision]) + h.to_bytes(2, "big") \
        + w.to_bytes(2, "big") + bytes([n_comp])
    for c in range(n_comp):
        sof += bytes(
            [component_ids[c], (sampling[c][0] << 4) | sampling[c][1], 0]
        )
    if arithmetic:
        sof_marker = b"\xff\xca" if progressive else b"\xff\xc9"
    else:
        sof_marker = b"\xff\xc2" if progressive else (
            b"\xff\xc0" if precision == 8 else b"\xff\xc1")
    out += sof_marker + (2 + len(sof)).to_bytes(2, "big") + sof
    # DHT: DC table 0 (12 categories, all 4 bits) + AC table 0 (all
    # 162 run/size symbols, all 8 bits) — canonical, Kraft-valid. A
    # progressive AC table additionally carries the EOB1..EOB14 run
    # symbols ((n << 4) | 0 — undefined in baseline, where the
    # decoder keeps rejecting them); baseline streams stay
    # byte-identical to the pre-progressive encoder.
    # 12-bit precision widens the category alphabets: DC diffs reach
    # category 15 (all 16 at 5 bits — NOT a Kraft-complete level, so
    # no all-ones code exists at any length) and AC sizes reach 14
    if arithmetic:
        # DAC: arithmetic conditioning — DC table 0 carries (U << 4)
        # | L (defaults 1/0), AC table 0 carries Kx (default 5); no
        # DHT exists in an arithmetic scan. Emitting the defaults
        # explicitly makes the fixture exercise the decoder's DAC
        # parse; the no-DAC default path is pinned by unit test.
        out += b"\xff\xcc\x00\x06" + bytes([0x00, 0x10, 0x10, 0x05])
    else:
        if precision == 8:
            dc_bits = [0, 0, 0, 12] + [0] * 12
            dc_vals = list(range(12))
            ac_sizes = range(1, 11)
        else:
            dc_bits = [0, 0, 0, 0, 16] + [0] * 11
            dc_vals = list(range(16))
            ac_sizes = range(1, 15)
        ac_vals = [0x00, 0xF0] \
            + ([n << 4 for n in range(1, 15)] if progressive else []) \
            + [(r << 4) | s for r in range(16) for s in ac_sizes]
        ac_bits = [0] * 7 + [len(ac_vals)] + [0] * 8
        dht = bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals) \
            + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
        out += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
    if restart_interval:
        out += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")

    def sos_header(comp_ids, ss, se, ah=0, al=0):
        s = bytes([len(comp_ids)])
        for cid in comp_ids:
            s += bytes([cid, 0x00])  # DC table 0 / AC table 0
        s += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + (2 + len(s)).to_bytes(2, "big") + s

    if not progressive:
        # baseline: ONE full-band interleaved scan
        out += sos_header([component_ids[c] for c in range(n_comp)], 0, 63)

    # canonical code assignment: INVERT the decoder's own table
    # builder rather than re-deriving T.81 Annex C here — like the
    # shared _JPEG_ZIGZAG, one implementation means the encoder's
    # fixtures and the decoder's walk cannot drift (r12 review)
    from citydata_etl_spark.operators.multimodal import _jpeg_huff_table

    def codes(bits, vals):
        return {v: lc for lc, v in _jpeg_huff_table(bits, vals).items()}

    if not arithmetic:
        dc_codes = codes(dc_bits, dc_vals)
        ac_codes = codes(ac_bits, ac_vals)
    acc = [0, 0]  # bit accumulator, bit count

    entropy = bytearray()

    def put(val, n):
        acc[0] = (acc[0] << n) | val
        acc[1] += n
        while acc[1] >= 8:
            byte = (acc[0] >> (acc[1] - 8)) & 0xFF
            entropy.append(byte)
            if byte == 0xFF:
                entropy.append(0x00)  # stuffing
            acc[1] -= 8
            acc[0] &= (1 << acc[1]) - 1

    def pad_to_byte():
        if acc[1] % 8:
            put((1 << (8 - acc[1] % 8)) - 1, 8 - acc[1] % 8)

    def category(v):
        return abs(v).bit_length()

    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcux * mcuy
    for ci in range(n_comp):
        sh, sv = sampling[ci]
        assert len(comp_blocks[ci]) == (mcuy * sv) * (mcux * sh)

    def zz_of(blk):
        flat = [int(blk[i // 8][i % 8]) for i in range(64)]
        return [flat[_JPEG_ZIGZAG[k]] for k in range(64)]

    def put_dc(diff):
        t = category(diff)
        ln, code = dc_codes[t]
        put(code, ln)
        if t:
            put(diff if diff > 0 else diff + (1 << t) - 1, t)

    def flush_scan():
        pad_to_byte()
        data = bytes(entropy)
        entropy.clear()
        return data

    if arithmetic:
        # --- sequential arithmetic (SOF9): the QM coder of T.81
        # Annex D driven by the Annex F.1.4 DC/AC statistical models,
        # sharing operators/multimodal.py:_QM_TABLE with the decoder
        # (the _JPEG_ZIGZAG pattern: one table, no drift — which is
        # also what makes the driver gate over these fixtures
        # bit-exact by construction). Encoder registers per Figures
        # D.2/D.8: A interval, C code with the output byte at bits
        # 19-26, CT countdown starting at 11 (3 spacer bits). Carry
        # resolution: this encoder holds the whole entropy segment in
        # memory and ripples +1 backward through it (simpler than the
        # spec's stacked-FF bookkeeping, same bytes); FF stuffing is
        # a post-pass, legal because stuffing is pure transport
        # escaping that the decoder's byte feed undoes.
        from citydata_etl_spark.operators.multimodal import (
            _QM_FIXED_BIN,
            _QM_TABLE,
        )

        KX = 5  # matches the DAC payload above
        DC_L, DC_U = 0, 1
        raw = bytearray()
        st_enc = [0x10000, 0, 11]  # A, C, CT

        def _ripple(add):
            i = len(raw) - 1
            while add and i >= 0:
                t = raw[i] + add
                raw[i] = t & 0xFF
                add = t >> 8
                i -= 1
            assert add == 0, "carry past stream start"

        def byteout():
            t = st_enc[1] >> 19
            if t > 0xFF:
                _ripple(t >> 8)
                t &= 0xFF
            raw.append(t)
            st_enc[1] &= 0x7FFFF

        def encode(st, i, bit):
            a, c, ct = st_enc
            s = st[i]
            qe, nmps, nlps, sw = _QM_TABLE[s & 0x7F]
            mps = s >> 7
            a -= qe
            if bit == mps:
                if a & 0x8000:
                    st_enc[0] = a
                    return
                if a < qe:  # conditional MPS exchange
                    c += a
                    a = qe
                st[i] = (mps << 7) | nmps
            else:
                if a >= qe:  # normal LPS: takes the top qe-sized part
                    c += a
                    a = qe
                # else conditional exchange: LPS keeps the bottom
                if sw:
                    mps = 1 - mps
                st[i] = (mps << 7) | nlps
            st_enc[0], st_enc[1] = a, c
            while True:  # RENORME
                st_enc[0] <<= 1
                st_enc[1] <<= 1
                ct -= 1
                if ct == 0:
                    byteout()  # reads/masks C through st_enc
                    ct = 8
                if st_enc[0] & 0x8000:
                    break
            st_enc[2] = ct

        def coder_flush():
            # Figure D.14: pick the in-interval code point with the
            # most trailing zeros, shift out, emit the final 2 bytes
            a, c, ct = st_enc
            t = (c + a - 1) & 0xFFFF0000
            c = t + 0x8000 if t < c else t
            c <<= ct
            carry = c >> 27
            if carry:
                _ripple(carry)
                c &= 0x7FFFFFF
            raw.append((c >> 19) & 0xFF)
            raw.append((c >> 11) & 0xFF)

        def stuffed():
            s = bytearray()
            for b in raw:
                s.append(b)
                if b == 0xFF:
                    s.append(0x00)
            raw.clear()
            return bytes(s)

        dc_stats = bytearray(64)
        ac_stats = bytearray(256)
        fixed = bytearray([_QM_FIXED_BIN])

        def reset_all():
            st_enc[0], st_enc[1], st_enc[2] = 0x10000, 0, 11
            dc_stats[:] = bytes(64)
            ac_stats[:] = bytes(256)
            fixed[0] = _QM_FIXED_BIN

        def enc_mag(st, head_bin, second_same, area_start, v):
            # magnitude tail (Figures F.7-F.9 / Table F.4-F.5 bins),
            # mirroring the decoder's decode_mag: v = magnitude - 1.
            # Returns the category BASE (the chain's m, MSB of v) —
            # the value the DC conditioning classifies (using the
            # magnitude itself desynchronizes the two sides' context
            # selection on small diffs).
            if v == 0:
                encode(st, head_bin, 0)
                return 0
            encode(st, head_bin, 1)
            m = 1
            pos = head_bin
            if second_same:
                if v >> 1:
                    encode(st, head_bin, 1)
                    m = 2
                    pos = area_start
                    v2 = v >> 2
                    while v2:
                        encode(st, pos, 1)
                        m <<= 1
                        pos += 1
                        v2 >>= 1
            else:
                pos = area_start
                v2 = v >> 1
                while v2:
                    encode(st, pos, 1)
                    m <<= 1
                    pos += 1
                    v2 >>= 1
            encode(st, pos, 0)
            cat_base = m
            pos += 14
            m >>= 1
            while m:
                encode(st, pos, 1 if v & m else 0)
                m >>= 1
            return cat_base

        if progressive:
            # --- progressive arithmetic (SOF10, r17): the Annex G.2
            # scan kinds (libjpeg jcarith's four encode_mcu flavors)
            # over the same coder / conditioning / magnitude-chain
            # closures as the sequential branch below. Each scan is an
            # independent entropy segment: fresh statistics + coder
            # per scan (and per restart), coder flush + FF stuffing at
            # scan end — the exact mirror of the decoder's
            # _jpeg_arith_scan(prog=...) path.
            if scan_script is None:
                scan_script = [(list(range(n_comp)), 0, 0, 0, 0)] + [
                    ([ci], 1, 63, 0, 0) for ci in range(n_comp)
                ]

            def comp_geom_a(ci):
                sh, sv = sampling[ci]
                cw = (w * sh + hmax - 1) // hmax
                chh = (h * sv + vmax - 1) // vmax
                return sh, sv, (cw + 7) // 8, (chh + 7) // 8

            def arith_rst(rst):
                coder_flush()
                out.extend(stuffed() + bytes([0xFF, 0xD0 + rst]))
                reset_all()
                return (rst + 1) % 8

            def arith_dc_scan(cis, Ah, Al):
                # G.2.1: first pass codes DPCM diffs of the ARITHMETIC
                # shift dc >> Al with the sequential DC model;
                # refinement emits one FIXED-bin bit per block
                spreds = {ci: 0 for ci in cis}
                sctx = {ci: 0 for ci in cis}
                rst = 0
                for m in range(n_mcu):
                    if restart_interval and m \
                            and m % restart_interval == 0:
                        rst = arith_rst(rst)
                        spreds = {ci: 0 for ci in cis}
                        sctx = {ci: 0 for ci in cis}
                    my, mx = divmod(m, mcux)
                    for ci in cis:
                        sh, sv = sampling[ci]
                        for by in range(sv):
                            for bx in range(sh):
                                idx = ((my * sv + by) * (mcux * sh)
                                       + mx * sh + bx)
                                dc = int(comp_blocks[ci][idx][0][0])
                                if Ah:
                                    encode(fixed, 0, (dc >> Al) & 1)
                                    continue
                                t = dc >> Al
                                diff = t - spreds[ci]
                                spreds[ci] = t
                                ctx = sctx[ci]
                                if diff == 0:
                                    encode(dc_stats, ctx, 0)
                                    sctx[ci] = 0
                                else:
                                    encode(dc_stats, ctx, 1)
                                    sign = 1 if diff < 0 else 0
                                    encode(dc_stats, ctx + 1, sign)
                                    mag = -diff if sign else diff
                                    cat_base = enc_mag(
                                        dc_stats, ctx + 2 + sign,
                                        False, 20, mag - 1)
                                    if cat_base < ((1 << DC_L) >> 1):
                                        sctx[ci] = 0
                                    elif cat_base > ((1 << DC_U) >> 1):
                                        sctx[ci] = 12 + 4 * sign
                                    else:
                                        sctx[ci] = 4 + 4 * sign

            def arith_ac_first(ci, Ss, Se, Al):
                # G.2.2: the sequential AC model band-limited to
                # [Ss, Se] over the magnitude point transform
                sh, sv, nbx, nby = comp_geom_a(ci)
                rst = 0
                for u in range(nby * nbx):
                    if restart_interval and u \
                            and u % restart_interval == 0:
                        rst = arith_rst(rst)
                    by, bx = divmod(u, nbx)
                    zzb = zz_of(comp_blocks[ci][by * (mcux * sh) + bx])
                    band = {
                        k: (abs(zzb[k]) >> Al)
                        * (1 if zzb[k] > 0 else -1)
                        for k in range(Ss, Se + 1)
                    }
                    ke = max((k for k, v in band.items() if v),
                             default=Ss - 1)
                    k = Ss
                    while k <= ke:
                        se = 3 * (k - 1)
                        encode(ac_stats, se, 0)  # not EOB
                        while band[k] == 0:
                            encode(ac_stats, se + 1, 0)
                            se += 3
                            k += 1
                        encode(ac_stats, se + 1, 1)
                        v = band[k]
                        sign = 1 if v < 0 else 0
                        encode(fixed, 0, sign)
                        mag = -v if sign else v
                        enc_mag(ac_stats, se + 2, True,
                                189 if k <= KX else 217, mag - 1)
                        k += 1
                    if ke < Se:
                        encode(ac_stats, 3 * (k - 1), 1)  # EOB
            def arith_ac_refine(ci, Ss, Se, Ah, Al):
                # G.2.3 / jcarith encode_mcu_AC_refine: EOB decisions
                # only past kex (last previously-significant
                # position); per position an adaptive correction bit
                # ((|v| >> Al) & 1) for already-significant
                # coefficients, run/newly-significant + FIXED-bin
                # sign for the rest. Clamping the ke/kex scans at
                # Ss - 1 is decision-equivalent to libjpeg's walk
                # below the band: any value < Ss makes every in-band
                # k > kex, which is all the condition reads.
                sh, sv, nbx, nby = comp_geom_a(ci)
                rst = 0
                for u in range(nby * nbx):
                    if restart_interval and u \
                            and u % restart_interval == 0:
                        rst = arith_rst(rst)
                    by, bx = divmod(u, nbx)
                    zzb = zz_of(comp_blocks[ci][by * (mcux * sh) + bx])
                    ke = Se
                    while ke >= Ss and (abs(zzb[ke]) >> Al) == 0:
                        ke -= 1
                    kex = ke
                    while kex >= Ss and (abs(zzb[kex]) >> Ah) == 0:
                        kex -= 1
                    k = Ss
                    while k <= ke:
                        se = 3 * (k - 1)
                        if k > kex:
                            encode(ac_stats, se, 0)  # not EOB yet
                        while True:
                            t = abs(zzb[k]) >> Al
                            if t:
                                if t >> 1:  # previously significant
                                    encode(ac_stats, se + 2, t & 1)
                                else:  # newly significant
                                    encode(ac_stats, se + 1, 1)
                                    encode(fixed, 0,
                                           1 if zzb[k] < 0 else 0)
                                break
                            encode(ac_stats, se + 1, 0)
                            se += 3
                            k += 1
                        k += 1
                    if k <= Se:
                        encode(ac_stats, 3 * (k - 1), 1)  # EOB

            for cis, sSs, sSe, sAh, sAl in scan_script:
                assert (sSs == 0 and sSe == 0) or \
                    (len(cis) == 1 and 1 <= sSs <= sSe <= 63)
                assert sAh == 0 or sAl == sAh - 1
                out += sos_header(
                    [component_ids[ci] for ci in cis],
                    sSs, sSe, sAh, sAl)
                reset_all()
                if sSs == 0:
                    arith_dc_scan(cis, sAh, sAl)
                elif sAh == 0:
                    arith_ac_first(cis[0], sSs, sSe, sAl)
                else:
                    arith_ac_refine(cis[0], sSs, sSe, sAh, sAl)
                coder_flush()
                out += stuffed()
            out += b"\xff\xd9"  # EOI
            return bytes(out)

        preds = [0] * n_comp
        dc_ctx = [0] * n_comp
        rst = 0
        reset_all()
        for m_i in range(n_mcu):
            if restart_interval and m_i and m_i % restart_interval == 0:
                coder_flush()
                out += stuffed() + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * n_comp
                dc_ctx = [0] * n_comp
                reset_all()
            my, mx = divmod(m_i, mcux)
            for ci in range(n_comp):
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        idx = (my * sv + by) * (mcux * sh) + mx * sh + bx
                        zzb = zz_of(comp_blocks[ci][idx])
                        # DC (Figures F.4-F.9, Table F.4 layout)
                        diff = zzb[0] - preds[ci]
                        preds[ci] = zzb[0]
                        ctx = dc_ctx[ci]
                        if diff == 0:
                            encode(dc_stats, ctx, 0)
                            dc_ctx[ci] = 0
                        else:
                            encode(dc_stats, ctx, 1)
                            sign = 1 if diff < 0 else 0
                            encode(dc_stats, ctx + 1, sign)
                            mag = -diff if sign else diff
                            cat_base = enc_mag(
                                dc_stats, ctx + 2 + sign, False,
                                20, mag - 1)
                            if cat_base < ((1 << DC_L) >> 1):
                                dc_ctx[ci] = 0
                            elif cat_base > ((1 << DC_U) >> 1):
                                dc_ctx[ci] = 12 + 4 * sign
                            else:
                                dc_ctx[ci] = 4 + 4 * sign
                        # AC (Figure F.5, 3 bins per k + Kx split)
                        ke = max(
                            (k for k in range(1, 64) if zzb[k]),
                            default=0,
                        )
                        k = 1
                        while k <= ke:
                            se = 3 * (k - 1)
                            encode(ac_stats, se, 0)  # not EOB
                            while zzb[k] == 0:
                                encode(ac_stats, se + 1, 0)
                                se += 3
                                k += 1
                            encode(ac_stats, se + 1, 1)
                            v = zzb[k]
                            sign = 1 if v < 0 else 0
                            encode(fixed, 0, sign)
                            mag = -v if sign else v
                            enc_mag(ac_stats, se + 2, True,
                                    189 if k <= KX else 217, mag - 1)
                            k += 1
                        if ke < 63:
                            encode(ac_stats, 3 * (ke + 1 - 1), 1)  # EOB
        coder_flush()
        out += stuffed()
    elif not progressive:
        preds = [0] * n_comp
        rst = 0
        for m in range(n_mcu):
            if restart_interval and m and m % restart_interval == 0:
                pad_to_byte()
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * n_comp
            my, mx = divmod(m, mcux)
            mcu_blocks = []  # (ci, block) in T.81 interleave order
            for ci in range(n_comp):
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        idx = (my * sv + by) * (mcux * sh) + mx * sh + bx
                        mcu_blocks.append((ci, comp_blocks[ci][idx]))
            for ci, blk in mcu_blocks:
                zz = zz_of(blk)
                diff = zz[0] - preds[ci]
                preds[ci] = zz[0]
                put_dc(diff)
                run = 0
                last_nz = max(
                    (k for k in range(1, 64) if zz[k]), default=0
                )
                for k in range(1, last_nz + 1):
                    v = zz[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[0xF0]
                        put(code, ln)  # ZRL
                        run -= 16
                    s = category(v)
                    assert 1 <= s <= (10 if precision == 8 else 14), \
                        "coefficient out of encodable range"
                    ln, code = ac_codes[(run << 4) | s]
                    put(code, ln)
                    put(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    ln, code = ac_codes[0x00]
                    put(code, ln)  # EOB
        out += flush_scan()
    else:
        # --- progressive (SOF2), scan-script driven. Default script =
        # spectral selection only (Ah = Al = 0): one interleaved DC
        # scan, then one full-band AC scan per component over its OWN
        # ceil(w_c/8) x ceil(h_c/8) block raster (T.81 non-interleaved
        # rule — MCU-padding blocks are never AC-coded; they lie
        # outside the visible raster, so pixels match the baseline
        # encode exactly). Runs of all-zero bands compress as EOBn
        # symbols, flushed before any content block, before every
        # restart marker (an EOB run may not span a restart), and at
        # scan end. A caller-supplied script adds successive
        # approximation (see docstring).
        if scan_script is None:
            scan_script = [(list(range(n_comp)), 0, 0, 0, 0)] + [
                ([ci], 1, 63, 0, 0) for ci in range(n_comp)
            ]

        def comp_geom(ci):
            sh, sv = sampling[ci]
            cw = (w * sh + hmax - 1) // hmax
            chh = (h * sv + vmax - 1) // vmax
            return sh, sv, (cw + 7) // 8, (chh + 7) // 8

        def encode_dc_scan(cis, Ah, Al):
            # interleaved MCU walk (or the identical 1x1 block raster
            # for a single-component frame); first pass codes DPCM
            # diffs of the ARITHMETIC shift dc >> Al (G.1.2.1),
            # refinement emits one raw bit per block, no Huffman
            preds = {ci: 0 for ci in cis}
            rst = 0
            for m in range(n_mcu):
                if restart_interval and m and m % restart_interval == 0:
                    pad_to_byte()
                    entropy.extend((0xFF, 0xD0 + rst))
                    rst = (rst + 1) % 8
                    preds = {ci: 0 for ci in cis}
                my, mx = divmod(m, mcux)
                for ci in cis:
                    sh, sv = sampling[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            idx = ((my * sv + by) * (mcux * sh)
                                   + mx * sh + bx)
                            dc = int(comp_blocks[ci][idx][0][0])
                            if Ah:
                                put((dc >> Al) & 1, 1)
                            else:
                                t = dc >> Al
                                put_dc(t - preds[ci])
                                preds[ci] = t
            return flush_scan()

        def encode_ac_first_scan(ci, Ss, Se, Al):
            sh, sv, nbx, nby = comp_geom(ci)
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                while eobrun:
                    n = min(14, eobrun.bit_length() - 1)
                    chunk = min(eobrun, (1 << (n + 1)) - 1)
                    ln, code = ac_codes[n << 4]
                    put(code, ln)
                    if n:
                        put(chunk - (1 << n), n)
                    eobrun -= chunk

            rst = 0
            for u in range(nby * nbx):
                if restart_interval and u and u % restart_interval == 0:
                    flush_eob()
                    pad_to_byte()
                    entropy.extend((0xFF, 0xD0 + rst))
                    rst = (rst + 1) % 8
                by, bx = divmod(u, nbx)
                zz = zz_of(comp_blocks[ci][by * (mcux * sh) + bx])
                # G.1.2.2 point transform: MAGNITUDE shift (truncate
                # toward zero), unlike the DC arithmetic shift
                band = {
                    k: (abs(zz[k]) >> Al) * (1 if zz[k] > 0 else -1)
                    for k in range(Ss, Se + 1)
                }
                last_nz = max((k for k, v in band.items() if v),
                              default=0)
                if last_nz == 0:
                    eobrun += 1
                    continue
                flush_eob()
                run = 0
                for k in range(Ss, last_nz + 1):
                    v = band[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[0xF0]
                        put(code, ln)  # ZRL
                        run -= 16
                    s = category(v)
                    assert 1 <= s <= (10 if precision == 8 else 14), \
                        "coefficient out of encodable range"
                    ln, code = ac_codes[(run << 4) | s]
                    put(code, ln)
                    put(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < Se:
                    eobrun += 1  # this block's EOB may extend a run
            flush_eob()
            return flush_scan()

        def encode_ac_refine_scan(ci, Ss, Se, Al):
            # T.81 G.1.2.3 / libjpeg jcphuff encode_mcu_AC_refine
            sh, sv, nbx, nby = comp_geom(ci)
            eobrun = 0
            pend = []  # per EOB-run block: its correction-bit list

            def flush_eob():
                # one EOBn per <= 32767 covered blocks, each followed
                # by ITS blocks' correction bits in block order — the
                # decoder reads them back per-block inside the run
                nonlocal eobrun
                while eobrun:
                    n = min(14, eobrun.bit_length() - 1)
                    chunk = min(eobrun, (1 << (n + 1)) - 1)
                    ln, code = ac_codes[n << 4]
                    put(code, ln)
                    if n:
                        put(chunk - (1 << n), n)
                    eobrun -= chunk
                    for bits in pend[:chunk]:
                        for bit in bits:
                            put(bit, 1)
                    del pend[:chunk]

            rst = 0
            for u in range(nby * nbx):
                if restart_interval and u and u % restart_interval == 0:
                    flush_eob()
                    pad_to_byte()
                    entropy.extend((0xFF, 0xD0 + rst))
                    rst = (rst + 1) % 8
                by, bx = divmod(u, nbx)
                zz = zz_of(comp_blocks[ci][by * (mcux * sh) + bx])
                absv = {k: abs(zz[k]) >> Al for k in range(Ss, Se + 1)}
                # index of the LAST newly-significant coefficient:
                # zeros beyond it are EOB material, never ZRL-coded
                eobk = max((k for k, t in absv.items() if t == 1),
                           default=Ss - 1)
                run = 0
                br = []  # correction bits since the last symbol
                for k in range(Ss, Se + 1):
                    t = absv[k]
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eobk:
                        flush_eob()
                        ln, code = ac_codes[0xF0]
                        put(code, ln)
                        run -= 16
                        for bit in br:
                            put(bit, 1)
                        br = []
                    if t > 1:
                        # already significant: buffer its correction
                        # bit (emitted after the next symbol, which is
                        # when the decoder walks past this position)
                        br.append(t & 1)
                        continue
                    # newly significant: run/1 + sign bit (1 = +)
                    flush_eob()
                    ln, code = ac_codes[(run << 4) | 1]
                    put(code, ln)
                    put(1 if zz[k] > 0 else 0, 1)
                    for bit in br:
                        put(bit, 1)
                    br = []
                    run = 0
                if run > 0 or br:
                    eobrun += 1
                    pend.append(br)
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()
            return flush_scan()

        for cis, Ss, Se, Ah, Al in scan_script:
            assert (Ss == 0 and Se == 0) or \
                (len(cis) == 1 and 1 <= Ss <= Se <= 63)
            assert Ah == 0 or Al == Ah - 1
            out += sos_header([component_ids[ci] for ci in cis],
                              Ss, Se, Ah, Al)
            if Ss == 0:
                out += encode_dc_scan(cis, Ah, Al)
            elif Ah == 0:
                out += encode_ac_first_scan(cis[0], Ss, Se, Al)
            else:
                out += encode_ac_refine_scan(cis[0], Ss, Se, Al)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _gif_media_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared GIF blob fixture for d5_gif_pixels: GENUINE GIF89a blobs
    (real LZW streams, palette in first-appearance order, a comment
    extension the walk must skip) with the SAME closed-form pixels as
    the PNG fixture, dims cycling by doc_id, every 4th image's data
    split into tiny sub-blocks (decoders must concatenate), every 5th
    image INTERLACED (four-pass row order the decode must undo —
    supported since r13; pixels unchanged, so the oracle is blind to
    the storage order and any reorder bug breaks parity), and a JPEG
    header blob every 7th row that must yield NULLs."""
    import pandas as pd

    docs = _spread_blob_feed(
        read_testdata(spark, sf_dir, "documents").select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                d = int(did)
                ids.append(d)
                if d % 7 == 0:
                    blobs.append(bytes.fromhex("FFD8FFE0") + b"\x00" * 50)
                    continue
                w, h = 4 + d % 5, 3 + d % 4
                rows = [
                    [
                        (
                            (d + 3 * x + 7 * y) % 256,
                            (2 * d + 5 * x + 11 * y + 1) % 256,
                            (3 * d + x + 13 * y + 2) % 256,
                        )
                        for x in range(w)
                    ]
                    for y in range(h)
                ]
                blobs.append(encode_gif(rows, split_subblocks=d % 4 == 0,
                                        interlace=d % 5 == 0))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return docs.mapInPandas(build, schema="media_id BIGINT, content BINARY")


@register(
    "d5_gif_pixels",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h,
             doc_id % 7 = 0 AS is_jpeg
      FROM documents),
    grid AS (
      SELECT media_id, w, h,
             CAST(gx.range AS BIGINT) AS x, CAST(gy.range AS BIGINT) AS y
      FROM p, range(8) gx, range(6) gy
      WHERE NOT is_jpeg AND gx.range < w AND gy.range < h),
    px AS (
      SELECT media_id, w, h, x, y,
             (media_id + 3 * x + 7 * y) % 256 AS r,
             (2 * media_id + 5 * x + 11 * y + 1) % 256 AS g,
             (3 * media_id + x + 13 * y + 2) % 256 AS b
      FROM grid),
    agg AS (
      SELECT media_id, w AS width, h AS height,
             CAST(w * h AS BIGINT) AS n_pixels,
             CAST(sum(r) AS BIGINT) AS sum_r,
             CAST(sum(g) AS BIGINT) AS sum_g,
             CAST(sum(b) AS BIGINT) AS sum_b,
             CAST(sum((y * w + x) * r) AS BIGINT) AS wsum_r,
             CAST(sum(CASE WHEN x = 0 AND y = 0
                      THEN r * 65536 + g * 256 + b END) AS BIGINT) AS p00
      FROM px GROUP BY media_id, w, h)
    SELECT p.media_id, a.width, a.height, a.n_pixels,
           a.sum_r, a.sum_g, a.sum_b, a.wsum_r, a.p00
    FROM p LEFT JOIN agg a ON p.media_id = a.media_id
    """,
    doc="D5: REAL GIF pixel decode with NO codec library — the LZW "
    "entropy decode implemented directly in the engine "
    "(operators/multimodal.py:_decode_gif_rgb / _gif_lzw_decode: "
    "LSB-first variable-width codes, dictionary growth, the KwKwK "
    "special case, width bumps, clear/EOI, 4096-cap reset) — one of "
    "the four no-library raster decoders (BMP/PNG/GIF/JPEG; the stub "
    "boundary closed entirely in r12). Blobs are GENUINE "
    "GIF89a: real LZW streams over first-appearance palettes, a "
    "comment extension the block walk must skip, every 4th image's "
    "stream split into 7-byte sub-blocks the decoder must join. "
    "Pixels share the PNG fixture's closed forms, so this oracle is "
    "IDENTICAL to d5_png_pixels' — the driver verifies a third codec "
    "producing the same logical pixels through the same stats "
    "kernel. The encoder/decoder width rule (BOTH follow giflib's "
    "codes-consumed counter, widening past 1<<w — including the "
    "final no-add emission, the r11 falsifier) is pinned by a "
    "hand-computed bitstream test, a deterministic boundary sweep, "
    "and a round-trip property test that forces dict growth and the "
    "12-bit cap.",
)
def d5_gif_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import bmp_pixel_stats

    return bmp_pixel_stats(_gif_media_fixture(spark, sf_dir))


def _jpeg_media_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared JPEG blob fixture for d5_jpeg_pixels: GENUINE baseline
    JFIF blobs (real Huffman entropy streams against encoder-emitted
    DHT tables, DPCM DC, byte stuffing) whose decoded pixels are
    CLOSED-FORM: every 8x8 tile is DC-only, so with the all-8s quant
    table tile (tx, ty) decodes to the exact flat YCbCr triple below
    — JPEG's lossiness is sidestepped by construction, not tolerated
    with an epsilon. Dims cycle by doc_id (including <8 and
    non-multiple-of-8 edges), every 5th image is 1-component
    grayscale, every 4th carries DRI=2 restart markers the decoder
    must consume in sequence, every frame at d % 3 == 1 is
    PROGRESSIVE (SOF2) with the SAME pixels — alternating between
    spectral selection only (r13) and libjpeg's default
    successive-approximation scan script (r14) — and every 7th row
    is a truncated header-only blob that must yield NULLs.

    r15 weaves (driver-gating the r14 decode paths + the new
    stored-RGB profile, oracle-compatible by construction):
    - HALF the grayscale class (d % 10 == 5) becomes 12-BIT with
      IDENTICAL pixels: stored DC 16*v - 2048 decodes to output byte
      v under the strip-to-high-byte convention, so the oracle's
      gray branch is untouched. Alternating sub-classes: d % 20 == 5
      is 1-component 12-bit (SOF1, or 12-bit SOF2 when progressive);
      d % 20 == 15 is 3-COMPONENT 12-bit with NEUTRAL chroma (stored
      Cb = Cr = 2048 exactly — the 12-bit YCbCr convert's chroma
      terms vanish, r = g = b = 16v >> 4 = v), exercising the
      interleaved 12-bit MCU walk and the 12-bit color convert.
    - the d % 5 == 2 class becomes STORED RGB (same three value
      functions, now channels directly — no YCbCr convert), with
      the detection signature alternating: APP14 transform 0 at
      d % 10 == 2, the unmarked 'R','G','B' component-id signature
      at d % 10 == 7. Progressive/DRI compose as before. Since r16
      these blobs carry NO JFIF APP0 (encode_jpeg drops it whenever
      adobe_transform is set or the cids are non-JFIF): libjpeg's
      jdapimin gives a JFIF marker precedence over both signatures
      for 3-component frames, and the decoder now honors that — a
      JFIF+APP14-transform-0 dual-marker blob decodes YCbCr
      (pixels unchanged; only the blob bytes differ from r15).

    r16 weave: every non-12-bit frame at d % 3 == 2 is SEQUENTIAL
    ARITHMETIC-coded (SOF9, QM coder + F.1.4 conditioning) with the
    SAME closed-form pixels — composing with grayscale, DRI restarts
    (coder flush + statistics reset per interval), and both
    stored-RGB signatures — so the new entropy decoder faces the
    driver hash invisibly to SQL, the same weave pattern as the
    progressive class.

    r17 weave: HALF the progressive class (d % 12 in (4, 7) — 7 is
    the SA-script flavor, 4 the spectral-selection-only flavor and
    ALWAYS DRI-composed since d % 12 == 4 implies d % 4 == 0) is
    PROGRESSIVE ARITHMETIC (SOF10, T.81 Annex G.2: the QM coder
    driving the DC/AC first + refinement models) with the same
    closed-form pixels, composing with DRI restarts (coder flush +
    statistics reset per interval inside every scan), grayscale
    (d % 60 == 40), both stored-RGB signatures (d % 60 == 52 APP14,
    d % 60 == 7 unmarked cids), and 12-bit precision (d % 60 == 55:
    3-component 12-bit SOF10); the other half of the progressive
    class (d % 12 in (1, 10)) keeps both script flavors Huffman —
    closing the last realistic entropy-coding combination."""
    import pandas as pd

    docs = _spread_blob_feed(
        read_testdata(spark, sf_dir, "documents").select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                d = int(did)
                ids.append(d)
                if d % 7 == 0:
                    blobs.append(bytes.fromhex("FFD8FFE0") + b"\x00" * 50)
                    continue
                w, h = 6 + d % 11, 5 + d % 9
                bw, bh = (w + 7) // 8, (h + 7) // 8

                def plane(f, center=128, scale=1):
                    out = []
                    for i in range(bw * bh):
                        tx, ty = i % bw, i // bw
                        blk = [[0] * 8 for _ in range(8)]
                        blk[0][0] = scale * f(tx, ty) - center
                        out.append(blk)
                    return out

                yf = lambda tx, ty: (d + 5 * tx + 9 * ty) % 256
                ri = 2 if d % 4 == 0 else 0
                # r16: every non-12-bit frame at d % 3 == 2 is
                # SEQUENTIAL ARITHMETIC (SOF9, QM coder) with the
                # SAME closed-form pixels — the oracle stays blind to
                # the entropy coding, so the new decode path faces the
                # driver hash invisibly to SQL; composes with gray,
                # DRI restarts, and both stored-RGB signatures
                # (disjoint from the progressive d % 3 == 1 class)
                # every frame at d % 3 == 1 is PROGRESSIVE (SOF2)
                # with the SAME closed-form pixels, so the oracle is
                # blind to the scan topology and any multi-scan
                # accumulation bug breaks parity; composes with
                # grayscale and DRI. Half of them (d % 6 == 1) use
                # libjpeg's DEFAULT successive-approximation script
                # (supported since r14: DC Al=1 + refinement, split
                # AC first passes, Ah=1 -> Al=0 refinements), the
                # other half (d % 6 == 4) spectral selection only.
                prog = d % 3 == 1
                # r17: HALF the progressive class (d % 12 in (4, 7)
                # — 7 hits the SA script flavor, 4 the spectral-only
                # one AND always carries DRI since d % 12 == 4
                # implies d % 4 == 0) is PROGRESSIVE ARITHMETIC
                # (SOF10) with the same closed-form pixels, composing
                # with DRI restarts, grayscale, both stored-RGB
                # signatures, and (via the 12-bit branch) 12-bit
                # precision; the other half (d % 12 in (1, 10))
                # keeps both script flavors on the Huffman side
                arith = (d % 3 == 2 and d % 10 != 5) \
                    or (prog and d % 12 in (4, 7))
                p12 = d % 10 == 5  # r15: 12-bit half of the gray class
                n_comp = 1 if d % 5 == 0 and not (p12 and d % 20 == 15) \
                    else 3
                script = jpeg_sa_scan_script(n_comp) \
                    if prog and d % 6 == 1 else None
                if p12:
                    # 12-bit, pixels IDENTICAL to the 8-bit gray twin:
                    # stored DC 16v - 2048 -> byte v (high-8 strip).
                    # d%20==15: 3-comp with NEUTRAL stored chroma
                    # (2048 exactly) so the 12-bit convert is exact.
                    ys12 = plane(yf, center=2048, scale=16)
                    comps12 = [ys12] if n_comp == 1 else [
                        ys12,
                        plane(lambda tx, ty: 0, center=0),
                        plane(lambda tx, ty: 0, center=0),
                    ]
                    blobs.append(encode_jpeg(comps12, w, h,
                                             restart_interval=ri,
                                             progressive=prog,
                                             scan_script=script,
                                             precision=12,
                                             arithmetic=arith))
                elif n_comp == 1:
                    blobs.append(encode_jpeg([plane(yf)], w, h,
                                             restart_interval=ri,
                                             progressive=prog,
                                             scan_script=script,
                                             arithmetic=arith))
                else:
                    comps3 = [
                        plane(yf),
                        plane(
                            lambda tx, ty: (2 * d + 7 * tx + 3 * ty)
                            % 256),
                        plane(
                            lambda tx, ty: (3 * d + tx + 11 * ty)
                            % 256),
                    ]
                    if d % 5 == 2:
                        # r15: STORED RGB — the same three planes ARE
                        # the channels; signature alternates between
                        # APP14 transform 0 and unmarked R,G,B cids
                        blobs.append(encode_jpeg(
                            comps3, w, h,
                            restart_interval=ri,
                            progressive=prog,
                            scan_script=script,
                            adobe_transform=0 if d % 10 == 2 else None,
                            component_ids=None if d % 10 == 2
                            else [0x52, 0x47, 0x42],
                            arithmetic=arith))
                    else:
                        blobs.append(encode_jpeg(comps3, w, h,
                                                 restart_interval=ri,
                                                 progressive=prog,
                                                 scan_script=script,
                                                 arithmetic=arith))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return docs.mapInPandas(build, schema="media_id BIGINT, content BINARY")


@register(
    "d5_jpeg_pixels",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             6 + doc_id % 11 AS w,
             5 + doc_id % 9 AS h,
             doc_id % 7 = 0 AS is_bad,
             doc_id % 5 = 0 AS is_gray,
             doc_id % 5 = 2 AS is_rgb
      FROM documents),
    grid AS (
      SELECT media_id, w, h, is_gray, is_rgb,
             CAST(gx.range AS BIGINT) AS x, CAST(gy.range AS BIGINT) AS y
      FROM p, range(17) gx, range(14) gy
      WHERE NOT is_bad AND gx.range < w AND gy.range < h),
    tiles AS (
      SELECT media_id, w, h, is_gray, is_rgb, x, y,
             (media_id + 5 * (x // 8) + 9 * (y // 8)) % 256 AS yv,
             (2 * media_id + 7 * (x // 8) + 3 * (y // 8)) % 256 AS cb,
             (3 * media_id + (x // 8) + 11 * (y // 8)) % 256 AS cr
      FROM grid),
    px AS (
      -- is_gray covers the r15 12-bit sub-classes too: their stored
      -- 16v-2048 DC decodes back to byte v (strip-to-high-byte), so
      -- the gray branch is untouched; is_rgb rows (r15 stored RGB)
      -- pass the three stored planes through as channels
      SELECT media_id, w, h, x, y,
             CASE WHEN is_gray THEN yv WHEN is_rgb THEN yv ELSE
               LEAST(255, GREATEST(0, CAST(floor(
                 yv + 1.402 * (cr - 128) + 0.5) AS BIGINT)))
             END AS r,
             CASE WHEN is_gray THEN yv WHEN is_rgb THEN cb ELSE
               LEAST(255, GREATEST(0, CAST(floor(
                 yv - 0.344136 * (cb - 128)
                    - 0.714136 * (cr - 128) + 0.5) AS BIGINT)))
             END AS g,
             CASE WHEN is_gray THEN yv WHEN is_rgb THEN cr ELSE
               LEAST(255, GREATEST(0, CAST(floor(
                 yv + 1.772 * (cb - 128) + 0.5) AS BIGINT)))
             END AS b
      FROM tiles),
    agg AS (
      SELECT media_id, w AS width, h AS height,
             CAST(w * h AS BIGINT) AS n_pixels,
             CAST(sum(r) AS BIGINT) AS sum_r,
             CAST(sum(g) AS BIGINT) AS sum_g,
             CAST(sum(b) AS BIGINT) AS sum_b,
             CAST(sum((y * w + x) * r) AS BIGINT) AS wsum_r,
             CAST(sum(CASE WHEN x = 0 AND y = 0
                      THEN r * 65536 + g * 256 + b END) AS BIGINT) AS p00
      FROM px GROUP BY media_id, w, h)
    SELECT p.media_id, a.width, a.height, a.n_pixels,
           a.sum_r, a.sum_g, a.sum_b, a.wsum_r, a.p00
    FROM p LEFT JOIN agg a ON p.media_id = a.media_id
    """,
    doc="D5: REAL baseline JPEG pixel decode with NO codec library — "
    "Huffman entropy decode (tables built from the stream's own DHT, "
    "not assumed), DPCM DC + run-length AC, dequantization, float64 "
    "8x8 IDCT, level shift, JFIF YCbCr->RGB — closing the LAST "
    "codec-stub boundary (operators/multimodal.py:_decode_jpeg_rgb; "
    "BMP/PNG/GIF decode since r8/r10/r11). JPEG is lossy, so the "
    "fixture makes exactness by CONSTRUCTION instead of tolerance: "
    "every 8x8 tile is DC-only, and a DC-only block with the all-8s "
    "quant table decodes to the exact flat sample m + 128 (IDCT of a "
    "constant basis), so the oracle states each tile's YCbCr and the "
    "JFIF conversion in closed form — floor(x + 0.5) on IEEE float64 "
    "is bit-identical between numpy and the SQL engine. The corpus "
    "exercises grayscale (every 5th), DRI=2 restart markers (every "
    "4th), SOF2 PROGRESSIVE frames (every frame at d%3==1, same "
    "pixels — spectral selection since r13, and since r14 HALF of "
    "them use libjpeg's default SUCCESSIVE-APPROXIMATION scan "
    "script: DC point-transform + bit-plane refinement passes, "
    "split AC first passes, a refinement spanning both split bands "
    "— so multi-scan coefficient accumulation, EOBn runs with "
    "correction bits, and per-coefficient progression tracking all "
    "face the oracle invisibly to SQL), sub-8 and "
    "non-multiple-of-8 dims, and "
    "truncated blobs (every 7th -> NULL row). Since r15 the mix "
    "also driver-gates 12-BIT precision (half the gray class, "
    "d%10==5: SOF1 extended-sequential and 12-bit SOF2, alternating "
    "1-component with 3-component-neutral-chroma — stored 16v-2048 "
    "decodes to byte v under the strip-to-high-byte convention, so "
    "pixels are IDENTICAL to the 8-bit twin and the oracle's gray "
    "branch is untouched) and STORED-RGB frames (the d%5==2 class: "
    "the three stored planes are the channels, no YCbCr convert — "
    "detection alternating between APP14 transform 0 and the "
    "unmarked 'R','G','B' component-id signature, libjpeg's "
    "color-space guess — since r16 emitted WITHOUT the JFIF APP0 "
    "whose libjpeg precedence would force YCbCr). Since r16 the "
    "d%3==2 class is SEQUENTIAL ARITHMETIC-coded (SOF9: QM coder + "
    "Annex F.1.4 conditioning models, DAC marker, per-restart coder "
    "re-init — operators/multimodal.py:_jpeg_arith_scan), same "
    "pixels, closing the last entropy-coding gap with any wild-web "
    "occurrence; only SOF10/lossless/hierarchical stay disclosed-"
    "None. This entry pins the "
    "4:4:4/grayscale profiles; subsampled 4:2:0/4:2:2 decode "
    "(supported since r13) is pinned by its own entry, "
    "d5_jpeg_pixels_420. AC coefficients, "
    "the zigzag path, and the 16-bit-peek Huffman resolve are pinned "
    "by the roundtrip property test against an independent "
    "double-loop IDCT model. Scale "
    "posture: per-blob Python inside ONE Arrow-batched mapInPandas "
    "pass, no shuffle, fan-out 1:1 — the canonical 100 TB media-scan "
    "shape.",
)
def d5_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import bmp_pixel_stats

    return bmp_pixel_stats(_jpeg_media_fixture(spark, sf_dir))


def _jpeg420_media_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared blob fixture for d5_jpeg_pixels_420: GENUINE baseline
    JFIF blobs with SUBSAMPLED chroma — every 3rd image 4:2:2
    ((2,1),(1,1),(1,1) sampling), the rest 4:2:0 ((2,2),(1,1),(1,1),
    the profile libjpeg encoders emit by default) — so the decoder's
    per-component MCU block layout, interleave order, per-component
    DPCM chains, and exact-replication chroma upsample all face the
    driver oracle, not just the unit battery. Pixels stay CLOSED-FORM
    via the d5_jpeg_pixels trick (DC-only blocks, all-8s quant): luma
    tiles are flat per 8x8 box, chroma tiles flat per 16x16 (4:2:0)
    or 16x8 (4:2:2) aligned box. Dims cycle through non-multiple-of-
    MCU edges (including widths between 8 and 16, where the luma grid
    is wider than the visible raster), every 4th image carries DRI=2
    restart markers (restart resets now span 6-block 4:2:0 MCUs), and
    every 7th row is a truncated header-only blob that must yield
    NULLs.

    r15 weaves the NON-DIVISOR sampling mix (decoded since r14 via
    index-map upsampling, driver-gated here): frames at d % 9 == 2
    use sampling ((3,1),(2,1),(1,1)) — Cb at 2/3 luma resolution
    (2 does not divide hmax=3, the profile the old divisor-only
    np.repeat upsampler rejected) and Cr at 1/3. Closed form stays
    exact: luma tiles are x//8 boxes (full-res identity map), Cb
    tiles cover x//12 boxes ((x*2//3)//8 == x//12), Cr tiles x//24
    boxes, all with y//8 rows (v factors all 1); the oracle states
    those box geometries for the class. Progressive (d%5==1, SA at
    d%10==1) and DRI (6-block non-divisor MCUs) compose."""
    import pandas as pd

    docs = _spread_blob_feed(
        read_testdata(spark, sf_dir, "documents").select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                d = int(did)
                ids.append(d)
                if d % 7 == 0:
                    blobs.append(bytes.fromhex("FFD8FFE0") + b"\x00" * 50)
                    continue
                w, h = 6 + d % 19, 5 + d % 17

                def plane(nbx, nby, f):
                    out = []
                    for i in range(nbx * nby):
                        tx, ty = i % nbx, i // nbx
                        blk = [[0] * 8 for _ in range(8)]
                        blk[0][0] = f(tx, ty) - 128
                        out.append(blk)
                    return out

                yfn = lambda tx, ty: (d + 5 * tx + 9 * ty) % 256
                cbfn = lambda tx, ty: (2 * d + 7 * tx + 3 * ty) % 256
                crfn = lambda tx, ty: (3 * d + tx + 11 * ty) % 256
                if d % 9 == 2:
                    # r15 NON-DIVISOR mix: luma (3,1) full-res, Cb
                    # (2,1) at 2/3 resolution (non-divisor vs
                    # hmax=3), Cr (1,1) at 1/3. One MCU row of
                    # 24-px-wide MCUs; closed-form boxes x//8 /
                    # x//12 / x//24 per plane, y//8 rows.
                    samp = [(3, 1), (2, 1), (1, 1)]
                    mcux = (w + 23) // 24
                    mcuy = (h + 7) // 8
                else:
                    fv = 1 if d % 3 == 0 else 2  # 4:2:2 vs 4:2:0
                    samp = [(2, fv), (1, 1), (1, 1)]
                    mcux = (w + 15) // 16
                    mcuy = (h + 8 * fv - 1) // (8 * fv)
                ys = plane(mcux * samp[0][0], mcuy * samp[0][1], yfn)
                cbs = plane(mcux * samp[1][0], mcuy * samp[1][1], cbfn)
                crs = plane(mcux * samp[2][0], mcuy * samp[2][1], crfn)
                blobs.append(encode_jpeg(
                    [ys, cbs, crs], w, h,
                    restart_interval=2 if d % 4 == 0 else 0,
                    sampling=samp,
                    # every 5th eligible frame: progressive + chroma
                    # subsampling composed (non-interleaved AC scans
                    # over each component's OWN sub-grid) — same
                    # pixels, oracle unchanged; alternating between
                    # spectral-selection-only and the libjpeg default
                    # SUCCESSIVE-APPROXIMATION script (d % 10 == 1),
                    # so SA composes with subsampled geometry and
                    # 6-block-MCU restart cadence under the oracle
                    progressive=d % 5 == 1,
                    scan_script=jpeg_sa_scan_script(3)
                    if d % 10 == 1 else None))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return docs.mapInPandas(build, schema="media_id BIGINT, content BINARY")


@register(
    "d5_jpeg_pixels_420",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             6 + doc_id % 19 AS w,
             5 + doc_id % 17 AS h,
             doc_id % 7 = 0 AS is_bad,
             doc_id % 9 = 2 AS is_nd,
             CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END AS fv
      FROM documents),
    grid AS (
      SELECT media_id, w, h, is_nd, fv,
             CAST(gx.range AS BIGINT) AS x, CAST(gy.range AS BIGINT) AS y
      FROM p, range(25) gx, range(22) gy
      WHERE NOT is_bad AND gx.range < w AND gy.range < h),
    tiles AS (
      -- is_nd (r15): non-divisor ((3,1),(2,1),(1,1)) sampling — Cb
      -- samples sit at x*2//3 so its 8-sample blocks cover x//12
      -- pixel boxes, Cr at x//3 -> x//24 boxes, all v factors 1
      SELECT media_id, w, h, x, y,
             (media_id + 5 * (x // 8) + 9 * (y // 8)) % 256 AS yv,
             CASE WHEN is_nd THEN
               (2 * media_id + 7 * (x // 12) + 3 * (y // 8)) % 256
             ELSE
               (2 * media_id + 7 * (x // 16)
                  + 3 * (y // (8 * fv))) % 256
             END AS cb,
             CASE WHEN is_nd THEN
               (3 * media_id + (x // 24) + 11 * (y // 8)) % 256
             ELSE
               (3 * media_id + (x // 16)
                  + 11 * (y // (8 * fv))) % 256
             END AS cr
      FROM grid),
    px AS (
      SELECT media_id, w, h, x, y,
             LEAST(255, GREATEST(0, CAST(floor(
               yv + 1.402 * (cr - 128) + 0.5) AS BIGINT))) AS r,
             LEAST(255, GREATEST(0, CAST(floor(
               yv - 0.344136 * (cb - 128)
                  - 0.714136 * (cr - 128) + 0.5) AS BIGINT))) AS g,
             LEAST(255, GREATEST(0, CAST(floor(
               yv + 1.772 * (cb - 128) + 0.5) AS BIGINT))) AS b
      FROM tiles),
    agg AS (
      SELECT media_id, w AS width, h AS height,
             CAST(w * h AS BIGINT) AS n_pixels,
             CAST(sum(r) AS BIGINT) AS sum_r,
             CAST(sum(g) AS BIGINT) AS sum_g,
             CAST(sum(b) AS BIGINT) AS sum_b,
             CAST(sum((y * w + x) * r) AS BIGINT) AS wsum_r,
             CAST(sum(CASE WHEN x = 0 AND y = 0
                      THEN r * 65536 + g * 256 + b END) AS BIGINT) AS p00
      FROM px GROUP BY media_id, w, h)
    SELECT p.media_id, a.width, a.height, a.n_pixels,
           a.sum_r, a.sum_g, a.sum_b, a.wsum_r, a.p00
    FROM p LEFT JOIN agg a ON p.media_id = a.media_id
    """,
    doc="D5: CHROMA-SUBSAMPLED baseline JPEG decode — 4:2:0 (the "
    "default output of libjpeg-family encoders, i.e. the majority "
    "profile in any scraped-image corpus) and 4:2:2 — with NO codec "
    "library (operators/multimodal.py:_decode_jpeg_rgb, sampling-"
    "factor support new in r13). What d5_jpeg_pixels pins for 4:4:4, "
    "this pins for the interleaved-MCU geometry: per-component "
    "sampling factors from the SOF, 2x2-luma + Cb + Cr block "
    "interleave per MCU, per-component DPCM predictor chains, "
    "restart resets spanning 6-block MCUs, and EXACT pixel-"
    "replication chroma upsampling (an aligned 16x16 or 16x8 box per "
    "chroma sample — an integer-exact convention a SQL oracle can "
    "state, unlike libjpeg's fancy upsampling filter). Exactness by "
    "CONSTRUCTION as in d5_jpeg_pixels: DC-only blocks with the "
    "all-8s quant table decode to flat tiles, so the oracle states "
    "luma per 8x8 box and chroma per upsampled box in closed form, "
    "and floor(x + 0.5) on IEEE float64 matches bit-for-bit across "
    "engines. Since r15 the mix driver-gates NON-DIVISOR sampling "
    "(frames at d%9==2: luma (3,1), Cb (2,1) — 2 does not divide "
    "hmax=3, exercising the r14 index-map upsampler x*ch//hmax where "
    "pixel-replication np.repeat cannot express the geometry — Cr "
    "(1,1); the oracle states the x//12 and x//24 chroma boxes in "
    "closed form; progressive/SA scripts and DRI over 6-block "
    "non-divisor MCUs compose). "
    "The r13 decoder rewrite this rides on also closed the "
    "r12 ADVICE items: the bit accumulator is truncated after every "
    "consume (O(stream) not O(n^2)), symbols resolve via 16-bit-peek "
    "LUTs (not one dict probe per bit), and the marker walk has no "
    "segment-count cap (split ICC profiles can carry hundreds of "
    "APP2 segments). Scale posture: per-blob Python inside ONE "
    "Arrow-batched mapInPandas pass, no shuffle, fan-out 1:1.",
)
def d5_jpeg_pixels_420(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import bmp_pixel_stats

    return bmp_pixel_stats(_jpeg420_media_fixture(spark, sf_dir))


def _jpeg_cmyk_media_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared blob fixture for d5_jpeg_cmyk: GENUINE 4-component
    Adobe JPEGs — CMYK (APP14 transform 0, every even doc_id) and
    YCCK (transform 2, every odd) — the print-origin profiles the
    r13 VERDICT named as the most common remaining real-corpus gap.
    Pixels stay CLOSED-FORM via the d5_jpeg_pixels trick (DC-only
    blocks, all-8s quant): each stored plane is flat per 8x8 tile,
    so the oracle states the Adobe ink combine (R = c*k/255 on the
    stored INVERTED values, the libjpeg-turbo convention) and, for
    YCCK, the JFIF un-encoding of the inverted C/M/Y planes, in
    closed form. Every frame at d % 3 == 1 is PROGRESSIVE with the
    4-component successive-approximation script (DC+AC first passes
    at Al=1, refinements to 0), every 4th carries DRI=2 restarts
    (8-block 4-component MCU resets), every frame carries an EXIF
    orientation tag cycling 1..8 (the entry's stats run over the
    UPRIGHT raster, so the oracle checks the pixel re-mapping), and
    every 7th row is a truncated header-only blob that must yield
    NULLs."""
    import pandas as pd

    docs = _spread_blob_feed(
        read_testdata(spark, sf_dir, "documents").select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                d = int(did)
                ids.append(d)
                if d % 7 == 0:
                    blobs.append(bytes.fromhex("FFD8FFEE") + b"\x00" * 50)
                    continue
                w, h = 6 + d % 10, 5 + d % 8
                bw, bh = (w + 7) // 8, (h + 7) // 8

                def plane(f):
                    out = []
                    for i in range(bw * bh):
                        tx, ty = i % bw, i // bw
                        blk = [[0] * 8 for _ in range(8)]
                        blk[0][0] = f(tx, ty) - 128
                        out.append(blk)
                    return out

                ps = [
                    plane(lambda tx, ty: (d + 5 * tx + 9 * ty) % 256),
                    plane(lambda tx, ty: (2 * d + 7 * tx + 3 * ty) % 256),
                    plane(lambda tx, ty: (3 * d + tx + 11 * ty) % 256),
                    plane(lambda tx, ty: (5 * d + 3 * tx + 7 * ty) % 256),
                ]
                prog = d % 3 == 1
                blobs.append(encode_jpeg(
                    ps, w, h,
                    restart_interval=2 if d % 4 == 0 else 0,
                    adobe_transform=0 if d % 2 == 0 else 2,
                    progressive=prog,
                    scan_script=jpeg_sa_scan_script(4) if prog else None,
                    # EXIF orientation cycling all eight values: the
                    # entry's stats run over the UPRIGHT raster, so
                    # the oracle verifies the pixel re-mapping (5-8
                    # swap dimensions), not just the tag
                    exif_orientation=1 + d % 8))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return docs.mapInPandas(build, schema="media_id BIGINT, content BINARY")


@register(
    "d5_jpeg_cmyk",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             6 + doc_id % 10 AS w,
             5 + doc_id % 8 AS h,
             doc_id % 7 = 0 AS is_bad,
             doc_id % 2 = 1 AS is_ycck,
             1 + doc_id % 8 AS o
      FROM documents),
    dims AS (
      SELECT *, CASE WHEN o >= 5 THEN h ELSE w END AS uw,
                CASE WHEN o >= 5 THEN w ELSE h END AS uh
      FROM p),
    grid AS (
      SELECT media_id, w, h, uw, uh, o, is_ycck,
             CAST(gx.range AS BIGINT) AS x, CAST(gy.range AS BIGINT) AS y
      FROM dims, range(16) gx, range(16) gy
      WHERE NOT is_bad AND gx.range < uw AND gy.range < uh),
    src AS (
      -- upright (x, y) -> stored (sx, sy) per EXIF orientation
      -- (TIFF 6.0 / PIL exif_transpose semantics)
      SELECT media_id, uw, uh, is_ycck, x, y,
             CASE o WHEN 2 THEN w - 1 - x WHEN 3 THEN w - 1 - x
                    WHEN 5 THEN y WHEN 6 THEN y
                    WHEN 7 THEN w - 1 - y WHEN 8 THEN w - 1 - y
                    ELSE x END AS sx,
             CASE o WHEN 3 THEN h - 1 - y WHEN 4 THEN h - 1 - y
                    WHEN 5 THEN x WHEN 6 THEN h - 1 - x
                    WHEN 7 THEN h - 1 - x WHEN 8 THEN x
                    ELSE y END AS sy
      FROM grid),
    tiles AS (
      SELECT media_id, uw, uh, is_ycck, x, y,
             (media_id + 5 * (sx // 8) + 9 * (sy // 8)) % 256 AS c0,
             (2 * media_id + 7 * (sx // 8) + 3 * (sy // 8)) % 256 AS c1,
             (3 * media_id + (sx // 8) + 11 * (sy // 8)) % 256 AS c2,
             (5 * media_id + 3 * (sx // 8) + 7 * (sy // 8)) % 256 AS c3
      FROM src),
    inks AS (
      SELECT media_id, uw, uh, x, y, c3 AS k,
             CASE WHEN is_ycck THEN LEAST(255, GREATEST(0, CAST(floor(
               c0 + 1.402 * (c2 - 128) + 0.5) AS BIGINT))) ELSE c0
             END AS c,
             CASE WHEN is_ycck THEN LEAST(255, GREATEST(0, CAST(floor(
               c0 - 0.344136 * (c1 - 128)
                  - 0.714136 * (c2 - 128) + 0.5) AS BIGINT))) ELSE c1
             END AS m,
             CASE WHEN is_ycck THEN LEAST(255, GREATEST(0, CAST(floor(
               c0 + 1.772 * (c1 - 128) + 0.5) AS BIGINT))) ELSE c2
             END AS yy
      FROM tiles),
    px AS (
      SELECT media_id, uw, uh, x, y,
             CAST(floor(c * k / 255 + 0.5) AS BIGINT) AS r,
             CAST(floor(m * k / 255 + 0.5) AS BIGINT) AS g,
             CAST(floor(yy * k / 255 + 0.5) AS BIGINT) AS b
      FROM inks),
    agg AS (
      SELECT media_id, uw AS width, uh AS height,
             CAST(uw * uh AS BIGINT) AS n_pixels,
             CAST(sum(r) AS BIGINT) AS sum_r,
             CAST(sum(g) AS BIGINT) AS sum_g,
             CAST(sum(b) AS BIGINT) AS sum_b,
             CAST(sum((y * uw + x) * r) AS BIGINT) AS wsum_r,
             CAST(sum(CASE WHEN x = 0 AND y = 0
                      THEN r * 65536 + g * 256 + b END) AS BIGINT) AS p00
      FROM px GROUP BY media_id, uw, uh)
    SELECT p.media_id, a.width, a.height, a.n_pixels,
           a.sum_r, a.sum_g, a.sum_b, a.wsum_r, a.p00
    FROM p LEFT JOIN agg a ON p.media_id = a.media_id
    """,
    doc="D5: 4-COMPONENT Adobe CMYK / YCCK JPEG decode (new in r14 — "
    "the print-origin profile the r13 VERDICT ranked the most common "
    "remaining real-corpus gap; a pipeline without it silently drops "
    "scanned-document and press-asset corpora). The decoder keys its "
    "color model on the APP14 Adobe transform flag "
    "(operators/multimodal.py:_decode_jpeg_rgb): transform 0 = stored "
    "inverted CMYK, combined to RGB by the libjpeg-turbo convention "
    "R = c*k/255 with the engine's floor(x+0.5) rounding; transform "
    "2 = YCCK, the inverted C/M/Y planes first un-encoded with the "
    "JFIF floats and clamped per-plane BEFORE the K combine — both "
    "steps stated verbatim in this oracle. Unmarked 4-component "
    "frames and transform 1 with 4 components are rejected as "
    "disclosed scope edges, never mis-converted (3-component "
    "transform-0 stored RGB DECODES since r15 — driver-gated in "
    "d5_jpeg_pixels). Every frame also carries an EXIF "
    "ORIENTATION tag cycling 1..8 and the stats run over the UPRIGHT "
    "raster (operators/multimodal.py:oriented_pixel_stats / "
    "_apply_exif_orientation — the r13 VERDICT's mis-rotation gap "
    "closed at the PIXEL level, not just surfaced as metadata): the "
    "oracle states the upright->stored coordinate re-mapping for all "
    "eight orientations, so orientations 5-8 must swap the reported "
    "dimensions and move p00/wsum_r to the visually-correct pixels. "
    "Exactness by construction (DC-only "
    "blocks, all-8s quant); frames compose with the r14 "
    "successive-approximation script (every d%3==1) and DRI=2 "
    "restarts over 8-block 4-component MCUs (every 4th). Scale "
    "posture: per-blob Python inside ONE Arrow-batched mapInPandas "
    "pass, no shuffle, fan-out 1:1.",
)
def d5_jpeg_cmyk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import (
        oriented_pixel_stats,
    )

    return oriented_pixel_stats(_jpeg_cmyk_media_fixture(spark, sf_dir))


def _png_media_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared PNG blob fixture for d5_png_pixels: GENUINE PNGs (real
    zlib DEFLATE streams, real CRC32s) with closed-form pixels, dims
    cycling by doc_id, per-row filter type (doc_id + y) % 5 — so the
    corpus exercises ALL FIVE standard filters including the
    sequential Average/Paeth paths — every 3rd image truecolor+alpha
    (the alpha channel is a decoy the decode must drop), every 4th
    image's stream split across two IDAT chunks, and a JPEG header
    blob every 7th row that must yield NULLs. Since r13, eligible
    frames at d % 5 == 1 are PALETTE-indexed (PNG8, color type 3):
    the SAME pixels re-expressed as first-seen-order palette + index
    raster, so every oracle stays byte-identical (including
    d5_png_ahash's cross-format invariant with the BMP fixture) and
    any PLTE-resolution bug breaks parity invisibly to SQL — the
    d5_gif interlace convention applied to the indexed profile.
    Frames at d % 5 == 2 are 16-BIT (same pixels in the high bytes,
    deterministic decoy low bytes the strip-16 projection must
    ignore), so the two-byte-lane filter stride and the high-byte
    semantics face the driver the same way."""
    import pandas as pd

    docs = _spread_blob_feed(
        read_testdata(spark, sf_dir, "documents").select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                d = int(did)
                ids.append(d)
                if d % 7 == 0:
                    blobs.append(bytes.fromhex("FFD8FFE0") + b"\x00" * 50)
                    continue
                w, h = 4 + d % 5, 3 + d % 4
                ch = 4 if d % 3 == 0 else 3
                rows = []
                for y in range(h):
                    row = []
                    for x in range(w):
                        row.append((d + 3 * x + 7 * y) % 256)
                        row.append((2 * d + 5 * x + 11 * y + 1) % 256)
                        row.append((3 * d + x + 13 * y + 2) % 256)
                        if ch == 4:
                            row.append((d + x + y) % 256)
                    rows.append(row)
                filters = [(d + y) % 5 for y in range(h)]
                if ch == 3 and d % 5 == 1:
                    # palette re-encoding of the SAME pixels (see doc)
                    colors: dict = {}
                    irows = [
                        [colors.setdefault(tuple(row[3 * x:3 * x + 3]),
                                           len(colors))
                         for x in range(w)]
                        for row in rows
                    ]
                    blobs.append(encode_png(
                        irows, 1, filters, split_idat=d % 4 == 0,
                        palette=list(colors)))
                elif d % 5 == 2:
                    # 16-bit re-encoding of the SAME pixels: high byte
                    # carries the closed-form sample, the low byte a
                    # deterministic decoy strip-16 must ignore — any
                    # decoder that rounds instead of stripping, or
                    # mis-strides the 2-byte lanes, breaks parity
                    rows16 = [
                        [v * 256 + (v * 31 + d) % 256 for v in row]
                        for row in rows
                    ]
                    blobs.append(encode_png(
                        rows16, ch, filters, split_idat=d % 4 == 0,
                        depth=16))
                else:
                    blobs.append(
                        encode_png(rows, ch, filters, split_idat=d % 4 == 0)
                    )
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return docs.mapInPandas(build, schema="media_id BIGINT, content BINARY")


@register(
    "d5_png_pixels",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h,
             doc_id % 7 = 0 AS is_jpeg
      FROM documents),
    grid AS (
      SELECT media_id, w, h,
             CAST(gx.range AS BIGINT) AS x, CAST(gy.range AS BIGINT) AS y
      FROM p, range(8) gx, range(6) gy
      WHERE NOT is_jpeg AND gx.range < w AND gy.range < h),
    px AS (
      SELECT media_id, w, h, x, y,
             (media_id + 3 * x + 7 * y) % 256 AS r,
             (2 * media_id + 5 * x + 11 * y + 1) % 256 AS g,
             (3 * media_id + x + 13 * y + 2) % 256 AS b
      FROM grid),
    agg AS (
      SELECT media_id, w AS width, h AS height,
             CAST(w * h AS BIGINT) AS n_pixels,
             CAST(sum(r) AS BIGINT) AS sum_r,
             CAST(sum(g) AS BIGINT) AS sum_g,
             CAST(sum(b) AS BIGINT) AS sum_b,
             CAST(sum((y * w + x) * r) AS BIGINT) AS wsum_r,
             CAST(sum(CASE WHEN x = 0 AND y = 0
                      THEN r * 65536 + g * 256 + b END) AS BIGINT) AS p00
      FROM px GROUP BY media_id, w, h)
    SELECT p.media_id, a.width, a.height, a.n_pixels,
           a.sum_r, a.sum_g, a.sum_b, a.wsum_r, a.p00
    FROM p LEFT JOIN agg a ON p.media_id = a.media_id
    """,
    doc="D5: REAL PNG pixel decode with NO codec library (r10 VERDICT "
    "task 3) — stdlib zlib inflate + per-row filter reversal "
    "(operators/multimodal.py:_decode_png_rgb); one of the four "
    "no-library raster decoders (BMP/PNG/GIF/JPEG — the stub "
    "boundary closed entirely in r12). "
    "Blobs are GENUINE PNGs — real DEFLATE streams, verified CRC32s "
    "— whose per-row filter type cycles (doc_id+y)%5 so the corpus "
    "exercises all five standard filters (incl. the sequential "
    "Average and Paeth predictor paths); every 3rd image carries an "
    "alpha-channel decoy the decode must drop, every 4th splits its "
    "stream across two IDAT chunks (decoders must concatenate before "
    "inflating), and every 7th row is a JPEG that must yield NULLs. "
    "Since r13 every 5th eligible frame is PALETTE-indexed (PNG8, "
    "color type 3 + PLTE) carrying the SAME pixels, so indexed "
    "decode faces the driver with the oracle unchanged. "
    "The filters are an ENCODING detail — the oracle states only the "
    "closed-form raw pixels, so any filter-reversal bug (wrong "
    "predictor, missed lane stride, swapped left/up) breaks parity. "
    "Same stats kernel and output shape as d5_bmp_pixels "
    "(position-weighted red sum + packed top-left pixel pin "
    "row-order and channel-order exactly).",
)
def d5_png_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import bmp_pixel_stats

    return bmp_pixel_stats(_png_media_fixture(spark, sf_dir))


def _png_adam7_media_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared blob fixture for d5_png_adam7: GENUINE Adam7-INTERLACED
    PNGs. Same closed-form pixel forms as _png_media_fixture, but
    dims cycle 4..18 x 3..16 so the seven interlace passes range from
    'most passes empty' (w or h < 5) to 'all seven populated'
    (>= 9x9) — the pass-geometry edge grid. The scanline filter type
    cycles (doc_id + k) % 5 over the PASS-ORDER scanline index k, so
    filter reversal is exercised against per-pass predictor resets
    (a filter chain that leaks state across a pass boundary breaks
    parity). Every 3rd image carries an alpha decoy, every 4th splits
    the stream across two IDAT chunks, every 7th row is a JPEG header
    that must yield NULLs; since r13 eligible frames at d % 5 == 1
    are palette-indexed (PNG8) with the SAME pixels — interlace and
    PLTE resolution composed, oracle unchanged — falling back to
    truecolor on the (deterministic) frames whose distinct-color
    count would overflow a 256-entry PLTE, and frames at d % 5 == 2
    are 16-bit with decoy low bytes (strip-16 + per-pass two-byte
    lanes composed with the interlace geometry)."""
    import pandas as pd

    docs = _spread_blob_feed(
        read_testdata(spark, sf_dir, "documents").select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                d = int(did)
                ids.append(d)
                if d % 7 == 0:
                    blobs.append(bytes.fromhex("FFD8FFE0") + b"\x00" * 50)
                    continue
                w, h = 4 + d % 15, 3 + d % 14
                ch = 4 if d % 3 == 0 else 3
                rows = []
                for y in range(h):
                    row = []
                    for x in range(w):
                        row.append((d + 3 * x + 7 * y) % 256)
                        row.append((2 * d + 5 * x + 11 * y + 1) % 256)
                        row.append((3 * d + x + 13 * y + 2) % 256)
                        if ch == 4:
                            row.append((d + x + y) % 256)
                    rows.append(row)
                # total pass scanlines = sum of the seven pass heights
                # = (2/8 + 1/8 + 2/4 + 1/4 + 2/2 + 1/2)h + ceil slack
                # < 2h + 7, so 2h + 8 over-provisions the filter cycle
                filters = [(d + k) % 5 for k in range(2 * h + 8)]
                if ch == 3 and d % 5 == 1:
                    # palette + Adam7 combined (same pixels, same
                    # oracle — the PNG8 convention of the straight
                    # fixture); frames here reach 18x16 = 288 px, so
                    # fall back to truecolor if the distinct-color
                    # count overflows a PLTE (deterministic per d)
                    colors: dict = {}
                    irows = [
                        [colors.setdefault(tuple(row[3 * x:3 * x + 3]),
                                           len(colors))
                         for x in range(w)]
                        for row in rows
                    ]
                    if len(colors) <= 256:
                        blobs.append(encode_png(
                            irows, 1, filters, split_idat=d % 4 == 0,
                            interlace=True, palette=list(colors)))
                        continue
                if d % 5 == 2:
                    # 16-bit + Adam7 composed: same pixels, decoy low
                    # bytes, per-pass 2-byte-lane strides on the line
                    rows16 = [
                        [v * 256 + (v * 31 + d) % 256 for v in row]
                        for row in rows
                    ]
                    blobs.append(encode_png(
                        rows16, ch, filters, split_idat=d % 4 == 0,
                        interlace=True, depth=16))
                    continue
                blobs.append(encode_png(rows, ch, filters,
                                        split_idat=d % 4 == 0,
                                        interlace=True))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return docs.mapInPandas(build, schema="media_id BIGINT, content BINARY")


@register(
    "d5_png_adam7",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 15 AS w,
             3 + doc_id % 14 AS h,
             doc_id % 7 = 0 AS is_jpeg
      FROM documents),
    grid AS (
      SELECT media_id, w, h,
             CAST(gx.range AS BIGINT) AS x, CAST(gy.range AS BIGINT) AS y
      FROM p, range(19) gx, range(17) gy
      WHERE NOT is_jpeg AND gx.range < w AND gy.range < h),
    px AS (
      SELECT media_id, w, h, x, y,
             (media_id + 3 * x + 7 * y) % 256 AS r,
             (2 * media_id + 5 * x + 11 * y + 1) % 256 AS g,
             (3 * media_id + x + 13 * y + 2) % 256 AS b
      FROM grid),
    agg AS (
      SELECT media_id, w AS width, h AS height,
             CAST(w * h AS BIGINT) AS n_pixels,
             CAST(sum(r) AS BIGINT) AS sum_r,
             CAST(sum(g) AS BIGINT) AS sum_g,
             CAST(sum(b) AS BIGINT) AS sum_b,
             CAST(sum((y * w + x) * r) AS BIGINT) AS wsum_r,
             CAST(sum(CASE WHEN x = 0 AND y = 0
                      THEN r * 65536 + g * 256 + b END) AS BIGINT) AS p00
      FROM px GROUP BY media_id, w, h)
    SELECT p.media_id, a.width, a.height, a.n_pixels,
           a.sum_r, a.sum_g, a.sum_b, a.wsum_r, a.p00
    FROM p LEFT JOIN agg a ON p.media_id = a.media_id
    """,
    doc="D5: Adam7-INTERLACED PNG decode (supported since r13 — the "
    "last common raster profile the no-library decoders lacked): the "
    "seven passes are independently-filtered sub-images scattered "
    "onto the raster on (x0 + j*dx, y0 + i*dy) grids "
    "(operators/multimodal.py:_ADAM7_PASSES / _png_unfilter / "
    "_decode_png_rgb). What d5_png_pixels pins for the straight "
    "scanline order, this pins for the interlaced geometry: per-pass "
    "expected-length accounting (empty passes at dims < 5 contribute "
    "ZERO scanlines — an off-by-one here shifts every later pass), "
    "per-pass filter-predictor resets, and the scatter stride. "
    "Pixels are the same closed forms as d5_png_pixels, so the "
    "oracle states raw pixels only and any interlace bug breaks "
    "parity; the fixture's dims (4..18 x 3..16) sweep 'most passes "
    "empty' through 'all seven populated'. Alpha decoys, split IDAT, "
    "palette-indexed frames (since r13, same pixels — interlace and "
    "PLTE resolution composed), and JPEG NULL rows as in the "
    "straight fixture; DEFLATE bomb ceiling applies to the per-pass "
    "SUM. Scale posture: per-blob "
    "stdlib decode inside ONE Arrow-batched mapInPandas pass, no "
    "shuffle, fan-out 1:1.",
)
def d5_png_adam7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import bmp_pixel_stats

    return bmp_pixel_stats(_png_adam7_media_fixture(spark, sf_dir))


def _video_tar_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared VIDEO fixture for d5_scene_cuts: one genuine ustar archive
    per doc_id, holding 5..7 genuine 24-bpp BMP frames
    (frame_<k>.bmp) whose pixels follow a closed form with a hard
    scene change at frame 2 + doc_id % 3 — value(channel, x) =
    base(channel, scene, frame) + x, bases chosen so no value ever
    wraps mod 256 (the SQL oracle needs plain arithmetic). Frames
    alternate storage orientation (even = bottom-up, odd = top-down)
    and carry live stride padding; tar headers carry REAL verified
    checksums (the member walk rejects forgeries). Per-pixel Python
    over <=24-px frames — synthesis only; the OPERATOR decodes
    vectorized."""
    import pandas as pd

    docs = _spread_blob_feed(
        read_testdata(spark, sf_dir, "documents").select("doc_id")
    )

    def tar_header(name: str, size: int) -> bytes:
        h = bytearray(512)
        nb = name.encode("ascii")
        h[0:len(nb)] = nb
        h[100:108] = b"0000644\0"
        h[108:116] = b"0000000\0"
        h[116:124] = b"0000000\0"
        h[124:136] = ("%011o" % size).encode("ascii") + b"\0"
        h[136:148] = b"00000000000\0"
        h[148:156] = b" " * 8  # checksum field reads as spaces
        h[156] = ord("0")
        h[257:263] = b"ustar\0"
        h[263:265] = b"00"
        chk = sum(h)
        h[148:156] = ("%06o" % chk).encode("ascii") + b"\0 "
        return bytes(h)

    def bmp(v: int, f: int) -> bytes:
        w, h = 4 + v % 3, 3 + v % 2
        scene = 0 if f < 2 + v % 3 else 1
        br = 20 + 120 * scene + f
        bg = 40 + 90 * scene + 2 * f
        bb = 60 + 60 * scene + 3 * f
        topdown = f % 2 == 1
        stride = (w * 3 + 3) // 4 * 4
        body = bytearray()
        yorder = range(h) if topdown else range(h - 1, -1, -1)
        for _y in yorder:
            row = bytearray()
            for x in range(w):
                row.append(bb + x)  # stored BGR
                row.append(bg + x)
                row.append(br + x)
            row.extend(b"\0" * (stride - len(row)))
            body.extend(row)
        header = (
            b"BM"
            + (54 + len(body)).to_bytes(4, "little")
            + b"\x00\x00\x00\x00"
            + (54).to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + (-h if topdown else h).to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little")
            + b"\x00" * 24
        )
        return bytes(header) + bytes(body)

    def build(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                v = int(did)
                tar = bytearray()
                for f in range(5 + v % 3):
                    data = bmp(v, f)
                    tar += tar_header(f"frame_{f:03d}.bmp", len(data))
                    tar += data
                    tar += b"\0" * ((512 - len(data) % 512) % 512)
                tar += b"\0" * 1024  # end-of-archive marker
                ids.append(v)
                blobs.append(bytes(tar))
            yield pd.DataFrame({"video_id": ids, "content": blobs})

    return docs.mapInPandas(build, schema="video_id BIGINT, content BINARY")


@register(
    "d5_scene_cuts",
    oracle="""
    SELECT doc_id AS video_id,
           CAST(2 + doc_id % 3 AS BIGINT) AS cut_frame,
           CAST(5 + doc_id % 3 AS BIGINT) AS n_frames,
           CAST((4 + doc_id % 3) * (3 + doc_id % 2) * 121 AS BIGINT)
             AS jump_r,
           CAST((4 + doc_id % 3) * (3 + doc_id % 2) * 92 AS BIGINT)
             AS jump_g,
           CAST((4 + doc_id % 3) * (3 + doc_id % 2) * 63 AS BIGINT)
             AS jump_b
    FROM documents
    """,
    doc="D5 [north-star multimodal, TEMPORAL]: SCENE-CUT detection over "
    "videos shipped as tar shards of image frames — the WebDataset "
    "video layout: operators/multimodal.py:tar_bmp_frame_stats walks "
    "each clip's verified ustar members, decodes every 24-bpp frame "
    "(both orientations, live stride padding), and emits exact int64 "
    "per-frame channel sums; the cut detector is then plain window "
    "algebra — lag() per video over frame_idx (parsed from the member "
    "NAME, so a re-packed shard keeps its timeline), flag frames "
    "where the red-channel jump exceeds 50 per pixel. Exactly one cut "
    "per clip by construction; the oracle states every clip's cut "
    "frame, frame count, and all three channel jump magnitudes in "
    "closed form, so a checksum walk, decode, name-parse, or window "
    "bug shifts the result. (Channel SUMS are row-order invariant — "
    "orientation is pinned by d5_bmp_pixels/d5_bmp_resize.) At 100 TB: "
    "one narrow pass over the shard blobs (fan-out = frames per "
    "clip), one shuffle on video_id for the lag window — the shape of "
    "any temporal-feature extraction over a video corpus.",
)
def d5_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.multimodal import (
        tar_bmp_frame_stats,
    )

    from citydata_etl_spark.caching import scoped_persist

    # persist the per-frame STATS (tiny int64 rows): the lag window and
    # the frame-count aggregate both consume them, and without the
    # persist each consumer re-ran the whole synth + tar walk + frame
    # decode Python pass (r18, measured: the two 32-task decode stages
    # were 0.78 s + 1.15 s — one of them pure recompute). At 100 TB
    # the same rule holds: persist decoded FEATURES, never blobs.
    frames = scoped_persist(
        tar_bmp_frame_stats(_video_tar_fixture(spark, sf_dir))
    )
    w = W.partitionBy("video_id").orderBy("frame_idx")
    jumps = frames.select(
        "video_id",
        "frame_idx",
        "n_pixels",
        F.abs(F.col("sum_r") - F.lag("sum_r").over(w)).alias("jump_r"),
        F.abs(F.col("sum_g") - F.lag("sum_g").over(w)).alias("jump_g"),
        F.abs(F.col("sum_b") - F.lag("sum_b").over(w)).alias("jump_b"),
    )
    counts = frames.groupBy("video_id").agg(
        F.count("*").cast("bigint").alias("n_frames")
    )
    cuts = jumps.filter(
        F.col("jump_r") > 50 * F.col("n_pixels")
    ).select(
        "video_id",
        F.col("frame_idx").alias("cut_frame"),
        F.col("jump_r").cast("bigint").alias("jump_r"),
        F.col("jump_g").cast("bigint").alias("jump_g"),
        F.col("jump_b").cast("bigint").alias("jump_b"),
    )
    return cuts.join(counts, "video_id").select(
        "video_id", "cut_frame", "n_frames", "jump_r", "jump_g", "jump_b"
    )


@register(
    "d5_bmp_pixels",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h,
             doc_id % 7 = 0 AS is_png
      FROM documents),
    grid AS (
      SELECT media_id, w, h,
             CAST(gx.range AS BIGINT) AS x, CAST(gy.range AS BIGINT) AS y
      FROM p, range(8) gx, range(6) gy
      WHERE NOT is_png AND gx.range < w AND gy.range < h),
    px AS (
      SELECT media_id, w, h, x, y,
             (media_id + 3 * x + 7 * y) % 256 AS b,
             (2 * media_id + 5 * x + 11 * y + 1) % 256 AS g,
             (3 * media_id + x + 13 * y + 2) % 256 AS r
      FROM grid),
    agg AS (
      SELECT media_id, w AS width, h AS height,
             CAST(w * h AS BIGINT) AS n_pixels,
             CAST(sum(r) AS BIGINT) AS sum_r,
             CAST(sum(g) AS BIGINT) AS sum_g,
             CAST(sum(b) AS BIGINT) AS sum_b,
             CAST(sum((y * w + x) * r) AS BIGINT) AS wsum_r,
             CAST(sum(CASE WHEN x = 0 AND y = 0
                      THEN r * 65536 + g * 256 + b END) AS BIGINT) AS p00
      FROM px GROUP BY media_id, w, h)
    SELECT p.media_id, a.width, a.height, a.n_pixels,
           a.sum_r, a.sum_g, a.sum_b, a.wsum_r, a.p00
    FROM p LEFT JOIN agg a ON p.media_id = a.media_id
    """,
    doc="D5 [north-star multimodal]: REAL uncompressed-raster pixel "
    "decode — the first codec (r8) of the now-complete no-library "
    "decode family (BMP/PNG/GIF/JPEG all real as of r12; SURVEY.md's "
    "decode step needs no codec library for BMP). Blobs are genuine "
    "24-bpp BITMAPINFOHEADER BMPs "
    "synthesized with pixel (x,y) values in closed form, dimensions "
    "cycling by doc_id, BOTH storage orientations (every 5th image "
    "top-down via negative biHeight) and live 4-byte stride padding "
    "(widths 4..8 give strides 12..24 with 0-3 pad bytes); every 7th "
    "row is a PNG that must yield NULLs. The operator "
    "(operators/multimodal.py:bmp_pixel_stats) header-parses and "
    "numpy-decodes each blob in Arrow-batched mapInPandas and emits "
    "exact integer stats; the POSITION-WEIGHTED red sum and packed "
    "top-left pixel are orientation- and stride-sensitive, so the "
    "closed-form oracle catches a dropped biHeight sign or padding "
    "bug that plain channel sums would mask.",
)
def d5_bmp_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import bmp_pixel_stats

    return bmp_pixel_stats(_bmp_media_fixture(spark, sf_dir))


@register(
    "d5_bmp_histogram",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h
      FROM documents
      WHERE doc_id % 7 <> 0),
    grid AS (
      SELECT media_id, w, h,
             CAST(gx.range AS BIGINT) AS x, CAST(gy.range AS BIGINT) AS y
      FROM p, range(8) gx, range(6) gy
      WHERE gx.range < w AND gy.range < h),
    px AS (
      SELECT media_id, x, y,
             (media_id + 3 * x + 7 * y) % 256 AS b,
             (2 * media_id + 5 * x + 11 * y + 1) % 256 AS g,
             (3 * media_id + x + 13 * y + 2) % 256 AS r
      FROM grid),
    chans AS (
      SELECT media_id, 'r' AS channel, r AS v FROM px
      UNION ALL
      SELECT media_id, 'g', g FROM px
      UNION ALL
      SELECT media_id, 'b', b FROM px)
    SELECT media_id, channel, v // 32 AS bin, count(*) AS n
    FROM chans GROUP BY media_id, channel, bin
    """,
    doc="D5 [north-star multimodal]: per-image CHANNEL HISTOGRAMS over "
    "real decoded pixels — the image-quality screening statistic (a "
    "training pipeline drops near-solid/low-entropy images the way "
    "Gopher drops repetitive text, and these 8-bin counts are what "
    "that filter reads). Same genuine-BMP fixture as d5_bmp_pixels "
    "(both orientations, live stride padding, PNGs that must emit "
    "nothing); the operator (operators/multimodal.py:"
    "bmp_channel_histogram) decodes each blob once and takes one "
    "np.bincount per channel inside Arrow-batched mapInPandas — "
    "bin = value div 32, integer exact, occupied bins only. The "
    "closed-form oracle restates the pixel expressions per channel, "
    "so a stride or channel-order bug shifts counts and hash-fails. "
    "(Histograms are row-order invariant, so a top-down/bottom-up "
    "orientation bug is invisible HERE by construction — orientation "
    "is pinned by d5_bmp_pixels and d5_bmp_resize, whose per-position "
    "values move when rows flip.)",
)
def d5_bmp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import (
        bmp_channel_histogram,
    )

    return bmp_channel_histogram(
        _bmp_media_fixture(spark, sf_dir), n_bins=8
    )


@register(
    "d5_bmp_resize",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h
      FROM documents
      WHERE doc_id % 7 <> 0),
    grid AS (
      SELECT media_id, w, h,
             CAST(gx.range AS BIGINT) AS x, CAST(gy.range AS BIGINT) AS y
      FROM p, range(2) gx, range(2) gy),
    src AS (
      SELECT media_id, x, y,
             (x * w) // 2 AS sx, (y * h) // 2 AS sy
      FROM grid)
    SELECT media_id, y, x,
           (3 * media_id + sx + 13 * sy + 2) % 256 AS r,
           (2 * media_id + 5 * sx + 11 * sy + 1) % 256 AS g,
           (media_id + 3 * sx + 7 * sy) % 256 AS b
    FROM src
    """,
    doc="D5 [north-star multimodal]: REAL nearest-neighbor image resize "
    "over the codec-free raster path (operators/multimodal.py:"
    "bmp_resize_nn — since r12 it resizes BMP, PNG, GIF, and baseline "
    "JPEG alike through _decode_image_rgb). Every image downsamples "
    "to 2x2 by the stated integer sampling rule (x2*W // 2, y2*H // 2 "
    "— floor division, no float coordinates), so the oracle evaluates "
    "the closed-form source pixel at each sampled coordinate; a "
    "decoder that mishandled orientation, stride, or the sampling "
    "convention produces different bytes at these exact positions. "
    "Long-format output (one row per resized pixel, PNG rows emit "
    "nothing) hashes engine-portably without array comparison.",
)
def d5_bmp_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import bmp_resize_nn

    return bmp_resize_nn(_bmp_media_fixture(spark, sf_dir), 2, 2)


@register(
    "d5_image_ahash",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h
      FROM documents
      WHERE doc_id % 7 <> 0),
    grid AS (
      SELECT media_id, w, h,
             CAST(gx.range AS BIGINT) AS x, CAST(gy.range AS BIGINT) AS y
      FROM p, range(8) gx, range(8) gy),
    src AS (
      SELECT media_id, x, y, (x * w) // 8 AS sx, (y * h) // 8 AS sy
      FROM grid),
    cells AS (
      SELECT media_id, y * 8 + x AS idx,
             (3 * media_id + sx + 13 * sy + 2) % 256
             + (2 * media_id + 5 * sx + 11 * sy + 1) % 256
             + (media_id + 3 * sx + 7 * sy) % 256 AS lum
      FROM src),
    t AS (
      SELECT media_id, idx, lum,
             sum(lum) OVER (PARTITION BY media_id) AS total
      FROM cells)
    SELECT media_id,
           CAST(sum(CASE WHEN lum * 64 > total AND idx < 32
                    THEN CAST(1 AS BIGINT) << CAST(idx AS INT)
                    ELSE 0 END) AS BIGINT) AS ahash_lo,
           CAST(sum(CASE WHEN lum * 64 > total AND idx >= 32
                    THEN CAST(1 AS BIGINT) << CAST(idx - 32 AS INT)
                    ELSE 0 END) AS BIGINT) AS ahash_hi,
           CAST(sum(CASE WHEN lum * 64 > total THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bits
    FROM t GROUP BY media_id
    """,
    doc="D5 [north-star multimodal]: PERCEPTUAL IMAGE FINGERPRINTS "
    "(average-hash) over real decoded pixels — image dedup's "
    "fingerprint step, the visual analog of d4_simhash: every "
    "decodable image resizes to an 8x8 grid (the real "
    "nearest-neighbor path, integer sampling), one bit per cell where "
    "luminance strictly exceeds the image mean (lum*64 > total — no "
    "division), packed into two BIGINT halves so no engine touches "
    "the sign bit (operators/multimodal.py:image_ahash). Near-dup "
    "images then pair through the d4_simhash_pairs chunk-blocking "
    "topology — fingerprints here, pairing machinery already "
    "verified there. ORIENTATION CONVENTION (r15): the hash is "
    "computed over the EXIF-UPRIGHT raster (decode_oriented_rgb), so "
    "a mis-rotated JPEG duplicate still collides with its upright "
    "twin — pinned by test_image_ahash_orientation_invariant; this "
    "fixture is BMP (no EXIF channel, stored == upright), so the "
    "oracle is unchanged. The oracle restates "
    "decode+resize+threshold+pack "
    "in closed form, so a stride, sampling, or packing bug flips "
    "bits and hash-fails. Unit test pins the perceptual property: "
    "byte-identical images collide exactly; a lightly perturbed "
    "image lands within small hamming distance.",
)
def d5_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import image_ahash

    return image_ahash(_bmp_media_fixture(spark, sf_dir), size=8)


@register(
    "d5_png_ahash",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h
      FROM documents
      WHERE doc_id % 7 <> 0),
    grid AS (
      SELECT media_id, w, h,
             CAST(gx.range AS BIGINT) AS x, CAST(gy.range AS BIGINT) AS y
      FROM p, range(8) gx, range(8) gy),
    src AS (
      SELECT media_id, x, y, (x * w) // 8 AS sx, (y * h) // 8 AS sy
      FROM grid),
    cells AS (
      SELECT media_id, y * 8 + x AS idx,
             (3 * media_id + sx + 13 * sy + 2) % 256
             + (2 * media_id + 5 * sx + 11 * sy + 1) % 256
             + (media_id + 3 * sx + 7 * sy) % 256 AS lum
      FROM src),
    t AS (
      SELECT media_id, idx, lum,
             sum(lum) OVER (PARTITION BY media_id) AS total
      FROM cells)
    SELECT media_id,
           CAST(sum(CASE WHEN lum * 64 > total AND idx < 32
                    THEN CAST(1 AS BIGINT) << CAST(idx AS INT)
                    ELSE 0 END) AS BIGINT) AS ahash_lo,
           CAST(sum(CASE WHEN lum * 64 > total AND idx >= 32
                    THEN CAST(1 AS BIGINT) << CAST(idx - 32 AS INT)
                    ELSE 0 END) AS BIGINT) AS ahash_hi,
           CAST(sum(CASE WHEN lum * 64 > total THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bits
    FROM t GROUP BY media_id
    """,
    doc="D5: the perceptual fingerprint pipeline over GENUINE PNGs — "
    "the same decode->resize->threshold->pack chain as d5_image_ahash "
    "but every blob goes through _decode_png_rgb (zlib inflate, all "
    "five row filters, alpha decoys, split IDAT, and — since r13 — "
    "palette-indexed frames) instead of the BMP header path. DELIBERATE CROSS-FORMAT INVARIANT: the PNG "
    "fixture's channel closed forms are a permutation of the BMP "
    "fixture's (r and b swapped), and average-hash depends only on "
    "the channel SUM, so this oracle is identical to d5_image_ahash's "
    "— the driver itself verifies that two different codecs decoding "
    "the same logical pixels produce the same fingerprint (the "
    "format-agnostic-kernels claim, checked end-to-end rather than "
    "asserted). Every-7th rows are JPEGs on both fixtures and emit "
    "nothing from the resize stage.",
)
def d5_png_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import image_ahash

    return image_ahash(_png_media_fixture(spark, sf_dir), size=8)


@register(
    "d5_image_neardup",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 11 = 0 AND doc_id > 0
                  THEN doc_id - 1 ELSE doc_id END AS eff
      FROM documents),
    p AS (
      SELECT media_id, eff, 4 + eff % 5 AS w, 3 + eff % 4 AS h
      FROM m WHERE eff % 7 <> 0),
    grid AS (
      SELECT media_id, eff, w, h,
             CAST(gx.range AS BIGINT) AS x, CAST(gy.range AS BIGINT) AS y
      FROM p, range(8) gx, range(8) gy),
    src AS (
      SELECT media_id, eff, x, y, (x * w) // 8 AS sx, (y * h) // 8 AS sy
      FROM grid),
    cells AS (
      SELECT media_id, y * 8 + x AS idx,
             (3 * eff + sx + 13 * sy + 2) % 256
             + (2 * eff + 5 * sx + 11 * sy + 1) % 256
             + (eff + 3 * sx + 7 * sy) % 256 AS lum
      FROM src),
    t AS (
      SELECT media_id, idx, lum,
             sum(lum) OVER (PARTITION BY media_id) AS total
      FROM cells),
    hashes AS (
      SELECT media_id,
             CAST(sum(CASE WHEN lum * 64 > total AND idx < 32
                      THEN CAST(1 AS BIGINT) << CAST(idx AS INT)
                      ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN lum * 64 > total AND idx >= 32
                      THEN CAST(1 AS BIGINT) << CAST(idx - 32 AS INT)
                      ELSE 0 END) AS BIGINT) AS hi
      FROM t GROUP BY media_id)
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
                AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
    """,
    doc="D5 [north-star multimodal]: IMAGE NEAR-DUP PAIRS end-to-end — "
    "decode -> perceptual fingerprint (image_ahash) -> pigeonhole "
    "chunk-blocked pairing (operators/multimodal.py:"
    "ahash_neardup_pairs: 4 disjoint 16-bit chunks, a pair within "
    "hamming 3 MUST agree on one chunk, so the equi-join blocking is "
    "lossless and no cross join exists), exact popcount verify. The "
    "fixture PLANTS ground truth: every 11th image is the "
    "byte-identical copy of its predecessor (hamming 0 by "
    "construction), so the entry proves the full image-dedup pipeline "
    "finds exactly the planted pairs plus any true hash collisions — "
    "the oracle states the same hashes all-pairs (exact at this "
    "scale), which is precisely what the blocking must be lossless "
    "against. ORIENTATION CONVENTION (r15): fingerprints hash the "
    "EXIF-UPRIGHT raster, so a rotated-stored JPEG duplicate still "
    "near-dup-matches its upright twin (the BMP fixture has no EXIF "
    "channel, so this oracle is unchanged; the convention is pinned "
    "by test_image_ahash_orientation_invariant). The visual "
    "counterpart of d4_simhash_pairs; at 100 TB "
    "candidate cost follows chunk-bucket occupancy, never n^2.",
)
def d5_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.multimodal import (
        ahash_neardup_pairs,
        image_ahash,
    )

    media = _bmp_media_fixture(spark, sf_dir, plant_dups=True)
    return ahash_neardup_pairs(image_ahash(media, size=8), max_hamming=3)


@register(
    "d5_gif_meta",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             1 + doc_id % 2047 AS w,
             1 + (doc_id * 11) % 1535 AS h,
             doc_id % 2 = 1 AS v89,
             doc_id % 4 = 0 AS has_gct,
             doc_id % 8 AS nbits,
             doc_id % 5 = 0 AS is_png
      FROM documents)
    SELECT media_id,
           CASE WHEN is_png THEN NULL
                WHEN v89 THEN '89a' ELSE '87a' END AS version,
           CASE WHEN is_png THEN NULL ELSE CAST(w AS BIGINT) END AS width,
           CASE WHEN is_png THEN NULL ELSE CAST(h AS BIGINT) END AS height,
           CASE WHEN is_png THEN NULL
                WHEN has_gct THEN CAST(2 AS BIGINT) << nbits
                ELSE CAST(0 AS BIGINT) END AS gct_entries,
           CASE WHEN is_png THEN NULL
                ELSE CAST((w * 1000) // h AS BIGINT) END AS aspect_pm
    FROM p
    """,
    doc="D5 [north-star multimodal]: GIF logical-screen metadata — the "
    "little-endian still-image companion to d5_png_meta (big-endian) "
    "and d5_jpeg_meta (marker walk): version, dimensions (LE uint16 "
    "byte-pair reversal via the wav _le_uint idiom), global-color-"
    "table size from the packed flags byte (2^(bits+1) when bit 7 "
    "set), exact per-mille aspect "
    "(operators/multimodal.py:gif_header_meta). All fixed offsets -> "
    "pure conv(hex,16,10) codegen, zero Python, zero exchanges. "
    "Headers synthesized in closed form (dims/flags cycling by "
    "doc_id, both versions, every 5th row a PNG that must yield "
    "NULLs); the parser is separately pinned against genuine GIF "
    "bytes in tests/test_multimodal.py.",
)
def d5_gif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.multimodal import gif_header_meta

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    w = (1 + d % 2047).cast("bigint")
    h = (1 + (d * 11) % 1535).cast("bigint")
    packed = (
        F.when(d % 4 == 0, 128 + (d % 8)).otherwise(d % 8)
    ).cast("bigint")

    def le2(c):
        return F.concat(
            F.lpad(F.hex(c % 256), 2, "0"),
            F.lpad(F.hex((c / 256).cast("bigint")), 2, "0"),
        )

    def b1(c):
        return F.lpad(F.hex(c), 2, "0")

    magic = F.when(
        d % 2 == 1, F.lit("474946383961")
    ).otherwise(F.lit("474946383761"))
    gif_hex = F.concat(magic, le2(w), le2(h), b1(packed), F.lit("0000"))
    png_hex = F.lit("89504E470D0A1A0A" + "00" * 6)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(
            F.when(d % 5 == 0, png_hex).otherwise(gif_hex)
        ).alias("content"),
    )
    return gif_header_meta(media)


@register(
    "d4_winnowing",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, length(text) AS L FROM documents
      WHERE length(text) >= 11),
    pos AS (
      SELECT doc_id, text, L - 3 AS ng,
             unnest(range(1, L - 3 + 1)) AS i
      FROM d),
    hs AS (
      SELECT doc_id, ng, i,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   list_filter(
                     string_split(
                       hex(encode(substring(text, CAST(i AS INT), 4))), ''),
                     c -> c <> ''),
                   c -> CAST(ascii(c) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % 1000000007) AS h
      FROM pos),
    wends AS (
      SELECT doc_id, h, i AS pos, i + jj AS j
      FROM hs, (SELECT unnest(range(8)) AS jj)
      WHERE i + jj <= ng AND i + jj >= 8),
    wmin AS (
      SELECT doc_id, j, min(h) AS mh FROM wends GROUP BY doc_id, j),
    picks AS (
      SELECT w.doc_id, w.j, w.h, max(w.pos) AS pos
      FROM wends w JOIN wmin m
        ON m.doc_id = w.doc_id AND m.j = w.j AND w.h = m.mh
      GROUP BY w.doc_id, w.j, w.h),
    fps AS (SELECT DISTINCT doc_id, h, pos FROM picks)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
           CAST(sum(h) AS BIGINT) AS fp_sum,
           CAST(sum(pos) AS BIGINT) AS pos_sum
    FROM fps GROUP BY doc_id
    """,
    doc="D4: robust winnowing fingerprints (Schleimer 2003 — the MOSS "
    "scheme): hash every char 4-gram (the shared hex_fold_hash "
    "codegen idiom), slide an 8-window over the hash sequence, select "
    "each window's RIGHTMOST MINIMAL hash; distinct selections are "
    "the doc's fingerprints, summarized order-free as (count, hash "
    "sum, position sum) so the oracle states them exactly. The "
    "position-stable, density-bounded LOCAL fingerprinter — between "
    "doc_fingerprint (whole-doc) and MinHash (set-level): edits "
    "perturb only nearby selections, the guarantee clone/overlap "
    "detection is built on (operators/text.py:winnowing_fingerprints). "
    "Engine shape: distributed explodes, ONE aggregate per stage; the "
    "rightmost-minimal pick is min(struct(hash, -pos)) — no join-back "
    "shuffle (the oracle's two-phase join states identical semantics; "
    "the engine's struct-min is the better physical plan).",
)
def d4_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.text import winnowing_fingerprints

    docs = read_testdata(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, k=4, w=8)
