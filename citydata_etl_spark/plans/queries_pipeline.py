"""Training-data pipeline queries (north-star, BASELINE.json): the
corpus-preparation layer downstream of dedup/similarity — deterministic
splits, stratified sampling, contamination detection, cleaned-corpus
materialization, sequence packing, shard balancing. All integer/rational
exact, all DuckDB-oracled (operators/pipeline.py holds the operators and
the 100 TB scale notes).

The reference stops at collection; its README names the downstream
objective these serve (reference README.md:6-7 — "score each city" /
analytics over the collected corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from citydata_etl_spark.operators import pipeline as P
from citydata_etl_spark.plans.catalog import register
from citydata_etl_spark.sources.readers import read_testdata

# Shared oracle fragment: the LCG id-bucket in pipeline.py:_id_bucket.
_BUCKET = "((doc_id * 2654435761 + 12345) % 2147483647)"


@register(
    "d6_train_split",
    oracle=f"""
    SELECT doc_id,
           {_BUCKET} % 100 AS bucket,
           CASE WHEN {_BUCKET} % 100 < 80 THEN 'train'
                WHEN {_BUCKET} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="D6: deterministic train/val/test split — id-hash bucketing, a "
    "pure codegen expression on the scan (no shuffle, stable under "
    "re-partitioning and corpus growth; operators/pipeline.py:train_split).",
)
def d6_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.train_split(read_testdata(spark, sf_dir, "documents"))


@register(
    "d6_stratified_sample",
    oracle=f"""
    SELECT lang AS stratum,
           count(*) AS n_total,
           CAST(sum(CASE WHEN {_BUCKET} % 100 < 20 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sampled,
           round(CAST(sum(CASE WHEN {_BUCKET} % 100 < 20 THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*), 6) AS realized_rate
    FROM documents GROUP BY lang
    """,
    doc="D6: stratified-sampling audit — deterministic 20% id-hash sample "
    "per language stratum with realized-rate drift check "
    "(operators/pipeline.py:stratified_sample_stats).",
)
def d6_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.stratified_sample_stats(
        read_testdata(spark, sf_dir, "documents"), rate_pct=20,
        strata_col="lang",
    )


@register(
    "d6_contamination",
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
    held AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 23 = 0),
    train_sh AS (SELECT * FROM sh WHERE doc_id % 23 <> 0),
    sizes AS (
      SELECT doc_id, count(*) AS n_shingles FROM train_sh GROUP BY doc_id),
    hits AS (
      SELECT s.doc_id, count(*) AS n_hits
      FROM train_sh s JOIN held h USING (shingle) GROUP BY s.doc_id)
    SELECT doc_id, n_hits, n_shingles,
           round(CAST(n_hits AS DOUBLE) / n_shingles, 6)
             AS contamination_ratio
    FROM hits JOIN sizes USING (doc_id)
    """,
    doc="D6: test-set contamination detection — word-4-gram overlap "
    "between train docs and a held-out set (id % 23 == 0), held-out "
    "shingles broadcast so the corpus side never shuffles "
    "(operators/pipeline.py:contamination).",
)
def d6_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.sources.readers import read_doc_shingle_set

    return P.contamination(
        read_testdata(spark, sf_dir, "documents"),
        n=4,
        holdout_mod=23,
        shingle_rel=read_doc_shingle_set(spark, sf_dir, 4),
    )


@register(
    "d6_dedup_keep",
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
      SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
    groups AS (SELECT id, min(r) AS group_id FROM reach GROUP BY id)
    SELECT d.doc_id FROM documents d
    LEFT JOIN groups g ON g.id = d.doc_id
    WHERE g.id IS NULL OR g.group_id = d.doc_id
    """,
    doc="D6: cleaned-corpus materialization — the end-to-end near-dedup "
    "decision: MinHash-LSH pairs -> connected components -> keep only "
    "canonical (min-id) members plus untouched docs, applied as a "
    "broadcast anti-join so the corpus never shuffles "
    "(operators/pipeline.py:cleaned_corpus_ids).",
)
def d6_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.cleaned_corpus_ids(read_testdata(spark, sf_dir, "documents"))


@register(
    "d6_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS start
      FROM t)
    SELECT doc_id, shard, n_tokens,
           CAST(start // 512 AS BIGINT) AS pack_id,
           CAST(start % 512 AS BIGINT) AS offset
    FROM c
    """,
    doc="D6: concat-and-split sequence packing — per-shard id-ordered "
    "token cumsum locates each doc's first token in fixed 512-token "
    "context windows (GPT-style packing; parallelism = shards, no global "
    "sort; operators/pipeline.py:pack_sequences).",
)
def d6_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.pack_sequences(
        read_testdata(spark, sf_dir, "documents"), ctx_len=512, n_shards=8
    )


@register(
    "d6_shard_stats",
    oracle=f"""
    SELECT {_BUCKET} % 16 AS shard,
           count(*) AS n_docs,
           CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
                AS BIGINT) AS total_tokens,
           min(doc_id) AS min_id,
           max(doc_id) AS max_id
    FROM documents GROUP BY shard
    """,
    doc="D6: shard-balance audit — doc and token totals per hashed shard, "
    "the skew check before committing a training-job partitioning "
    "(operators/pipeline.py:shard_stats).",
)
def d6_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.shard_stats(read_testdata(spark, sf_dir, "documents"), n_shards=16)


@register(
    "d4_tfidf_topk",
    oracle="""
    WITH tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 1, 1) + 1)) AS i
      FROM tokl),
    sh AS (
      SELECT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 1 AS INT)], ' ')
               AS term
      FROM idx),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM sh GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT doc_id, term, tf, df,
             round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, term) AS rnk
      FROM scored)
    SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
    doc="D4: top-3 characteristic bigrams per doc by TF-IDF — integer "
    "tf/df, rounded transcendental, rank over the ROUNDED score with a "
    "term tie-break (total order, engine-portable). Bigram terms keep "
    "scores discriminative on a small-vocabulary corpus where unigram "
    "df ~= N (operators/text.py:tfidf_top_terms).",
)
def d4_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(
        read_testdata(spark, sf_dir, "documents"), k=3, shingle_n=2
    )


@register(
    "d6_label_centroid",
    oracle="""
    WITH v AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    idx AS (
      SELECT label, e, unnest(range(1, len(e) + 1)) AS i FROM v),
    x AS (
      SELECT label, CAST(i - 1 AS BIGINT) AS dim, e[CAST(i AS INT)] AS val
      FROM idx)
    SELECT label, dim, round(avg(val), 4) AS centroid,
           count(*) AS n_vecs
    FROM x GROUP BY label, dim
    """,
    doc="D6: per-label embedding centroids in long form — the "
    "class-centroid primitive behind IVF quantizers and cluster QA; one "
    "posexplode + one map-side-combined groupBy on the bounded "
    "(label, dim) key (operators/similarity.py:label_centroids).",
)
def d6_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.similarity import label_centroids

    return label_centroids(read_testdata(spark, sf_dir, "embeddings"))


@register(
    "d6_curation_pipeline",
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
      SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
    losers AS (
      SELECT id FROM (SELECT id, min(r) AS g FROM reach GROUP BY id)
      WHERE g <> id),
    idx4 AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 3, 1) + 1)) AS i
      FROM tokl),
    sh4 AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 3 AS INT)], ' ')
               AS shingle
      FROM idx4),
    held AS (SELECT DISTINCT shingle FROM sh4 WHERE doc_id % 23 = 0),
    contam AS (
      SELECT DISTINCT s.doc_id
      FROM sh4 s JOIN held USING (shingle) WHERE s.doc_id % 23 <> 0),
    feat AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tokens,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS mtl,
             len(list_filter(list_filter(string_split(text, ' '),
                 x -> x <> ''), x -> list_contains(
                 ['the','a','of','and','to','in','is','that','it','for'],
                 x))) AS n_sw
      FROM documents),
    surv AS (
      SELECT f.doc_id, f.n_tokens,
             CASE WHEN ((f.doc_id * 2654435761 + 12345) % 2147483647)
                       % 100 < 80 THEN 'train'
                  WHEN ((f.doc_id * 2654435761 + 12345) % 2147483647)
                       % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM feat f
      WHERE f.doc_id % 23 <> 0
        AND least(CAST(f.n_tokens AS DOUBLE) / 50.0, 1.0)
            * (CASE WHEN f.mtl >= 2.0 AND f.mtl <= 12.0
                    THEN 1.0 ELSE 0.5 END) >= 0.5
        AND CAST(f.n_sw AS DOUBLE) / f.n_tokens >= 0.05
        AND f.doc_id NOT IN (SELECT id FROM losers)
        AND f.doc_id NOT IN (SELECT doc_id FROM contam))
    SELECT split, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM surv GROUP BY split
    """,
    doc="D6 capstone: the corpus-curation pipeline composed end-to-end in "
    "ONE plan — quality gate x language ID x MinHash-LSH near-dedup keep "
    "x 4-gram decontamination, reported per train/val/test split. ONE "
    "corpus scan with quality/lang/split as inline codegen expressions; "
    "the only joins are broadcast anti-joins against the corpus-fraction-"
    "sized dedup-loser and contaminated-id sets "
    "(operators/pipeline.py:curation_summary).",
)
def d6_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.curation_summary(read_testdata(spark, sf_dir, "documents"))


@register(
    "d4_repetition_stats",
    oracle="""
    WITH tokl AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 1, 1) + 1)) AS i
      FROM tokl),
    grams AS (
      SELECT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 1 AS INT)], ' ')
               AS shingle
      FROM idx),
    g AS (
      SELECT doc_id, shingle, count(*) AS cnt
      FROM grams WHERE shingle <> '' GROUP BY doc_id, shingle)
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_grams,
           count(*) AS n_distinct,
           CAST(max(cnt) AS BIGINT) AS top_count,
           round(1.0 - count(*) / CAST(sum(cnt) AS DOUBLE), 6)
             AS dup_ngram_frac,
           round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 6) AS top_ngram_share
    FROM g GROUP BY doc_id
    """,
    doc="D4: Gopher-style repetition signals per doc — duplicate-bigram "
    "fraction and top-bigram share (the MassiveText repetition-filter "
    "family, Rae et al. 2021 A1.1). One (doc, gram) shuffle with map-side "
    "partial counts, then a map-side-combinable per-doc reduce — no "
    "window, no join (operators/text.py:repetition_stats).",
)
def d4_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.text import repetition_stats

    return repetition_stats(read_testdata(spark, sf_dir, "documents"), n=2)


@register(
    "d6_domain_mix",
    oracle="""
    WITH t AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(list_filter(string_split(text, ' '),
                  x -> x <> ''))) AS BIGINT) AS total_tokens
      FROM documents GROUP BY source),
    k AS (SELECT count(*) AS k FROM t),
    c AS (SELECT t.*, 1.0 / k AS w FROM t CROSS JOIN k),
    m AS (SELECT c.*, min(total_tokens / w) OVER () AS cap FROM c)
    SELECT source, n_docs, total_tokens,
           round(w, 6) AS target_weight,
           round(least(1.0, cap * w / total_tokens), 6) AS keep_rate
    FROM m
    """,
    doc="D6: domain-mixing plan — per-source keep rates realizing the "
    "largest corpus with an exact target mix (water-filling: "
    "N = min_s T_s/w_s, rate = N*w_s/T_s; the binding source keeps all). "
    "One map-side-combinable groupBy(source); the water-fill runs on the "
    "dimension-sized aggregate (operators/pipeline.py:domain_mix).",
)
def d6_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.domain_mix(read_testdata(spark, sf_dir, "documents"))


@register(
    "d6_fixed_sample",
    oracle="""
    WITH c AS (
      SELECT doc_id, source,
             CAST((doc_id * 2654435761 + 12345) % 2147483647 AS BIGINT)
               AS coin
      FROM documents),
    r AS (
      SELECT doc_id, source, coin,
             CAST(row_number() OVER (PARTITION BY source
                  ORDER BY coin, doc_id) AS BIGINT) AS sample_rank
      FROM c)
    SELECT doc_id, source, coin, sample_rank FROM r WHERE sample_rank <= 25
    """,
    doc="D6: fixed-size deterministic per-stratum sample (reservoir "
    "analog for eval sets): rank each source by the id-hash coin, keep "
    "the k smallest — stable under re-partitioning and under growth in "
    "other strata, so a frozen eval slice re-derives from the raw corpus. "
    "One shuffle + a partitioned window "
    "(operators/pipeline.py:stratified_fixed_sample).",
)
def d6_fixed_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.stratified_fixed_sample(
        read_testdata(spark, sf_dir, "documents"), k=25
    )


@register(
    "d6_domain_mix_apply",
    oracle="""
    WITH t AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(list_filter(string_split(text, ' '),
                  x -> x <> ''))) AS BIGINT) AS total_tokens
      FROM documents GROUP BY source),
    k AS (SELECT count(*) AS k FROM t),
    c AS (SELECT t.*, 1.0 / k AS w FROM t CROSS JOIN k),
    m AS (SELECT c.*, min(total_tokens / w) OVER () AS cap FROM c),
    r AS (
      SELECT source,
             round(least(1.0, cap * w / total_tokens), 6) AS keep_rate
      FROM m)
    SELECT d.doc_id, d.source, r.keep_rate,
           CASE WHEN ((d.doc_id * 2654435761 + 12345) % 2147483647)
                     % 1000000
                < floor(r.keep_rate * 1000000 + 0.5)
                THEN 1 ELSE 0 END AS keep
    FROM documents d JOIN r USING (source)
    """,
    doc="D6: materialize the domain-mix water-fill into a deterministic "
    "subsample — per-source keep rates become an id-hash coin flip "
    "(lcg(doc_id) mod 1e6 < rate*1e6), so the sampled corpus is "
    "reproducible and auditable. Rates table is dimension-sized -> "
    "broadcast; the corpus scans once with a codegen filter "
    "(operators/pipeline.py:domain_mix_apply).",
)
def d6_domain_mix_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.domain_mix_apply(read_testdata(spark, sf_dir, "documents"))


@register(
    "d6_domain_cap",
    oracle="""
    WITH s AS (
      SELECT doc_id, source,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tokens,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS mtl
      FROM documents),
    q AS (
      SELECT doc_id, source,
             least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
             * (CASE WHEN mtl >= 2.0 AND mtl <= 12.0 THEN 1.0 ELSE 0.5 END)
               AS quality
      FROM s),
    r AS (
      SELECT doc_id, source, quality,
             CAST(row_number() OVER (PARTITION BY source
                  ORDER BY quality DESC, doc_id) AS BIGINT) AS domain_rank
      FROM q)
    SELECT doc_id, source, quality, domain_rank,
           CASE WHEN domain_rank <= 60 THEN 1 ELSE 0 END AS keep
    FROM r
    """,
    doc="D6: per-domain document cap — bound any single domain's share of "
    "the training mix by keeping at most N docs per source, ranked "
    "(quality desc, id). One shuffle on source + a PARTITIONED row_number "
    "window; every doc is returned with its rank and keep flag so the "
    "drop set stays auditable "
    "(operators/pipeline.py:domain_cap).",
)
def d6_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.domain_cap(read_testdata(spark, sf_dir, "documents"), cap=60)


@register(
    "d6_quality_funnel",
    oracle="""
    WITH m AS (
      SELECT len(toks) AS n_tokens,
             CAST(n_chars - n_spaces AS DOUBLE) / len(toks) AS mean_len,
             CAST(len(list_filter(toks, t -> t IN
               ('the','a','of','and','to','in','is','that','it','for')))
               AS DOUBLE) / len(toks) AS sw_ratio,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
               AS distinct_ratio
      FROM (
        SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks,
               length(text) AS n_chars,
               length(text) - length(replace(text, ' ', '')) AS n_spaces
        FROM documents)),
    c AS (
      SELECT n_tokens,
             (n_tokens >= 1) AS c0,
             (n_tokens >= 1 AND n_tokens >= 16) AS c1,
             (n_tokens >= 1 AND n_tokens >= 16
              AND mean_len >= 2.0 AND mean_len <= 12.0) AS c2,
             (n_tokens >= 1 AND n_tokens >= 16
              AND mean_len >= 2.0 AND mean_len <= 12.0
              AND sw_ratio >= 0.05) AS c3,
             (n_tokens >= 1 AND n_tokens >= 16
              AND mean_len >= 2.0 AND mean_len <= 12.0
              AND sw_ratio >= 0.05 AND distinct_ratio > 0.3) AS c4
      FROM m),
    w AS (
      SELECT
        sum(CASE WHEN c0 THEN 1 ELSE 0 END) AS n0,
        sum(CASE WHEN c0 THEN n_tokens ELSE 0 END) AS t0,
        sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS n1,
        sum(CASE WHEN c1 THEN n_tokens ELSE 0 END) AS t1,
        sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS n2,
        sum(CASE WHEN c2 THEN n_tokens ELSE 0 END) AS t2,
        sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS n3,
        sum(CASE WHEN c3 THEN n_tokens ELSE 0 END) AS t3,
        sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS n4,
        sum(CASE WHEN c4 THEN n_tokens ELSE 0 END) AS t4
      FROM c)
    SELECT CAST(0 AS BIGINT) AS stage, 'non_empty' AS stage_name,
           CAST(n0 AS BIGINT) AS n_surviving,
           CAST(t0 AS BIGINT) AS tokens_surviving FROM w
    UNION ALL SELECT 1, 'min_length', CAST(n1 AS BIGINT),
                     CAST(t1 AS BIGINT) FROM w
    UNION ALL SELECT 2, 'word_shape', CAST(n2 AS BIGINT),
                     CAST(t2 AS BIGINT) FROM w
    UNION ALL SELECT 3, 'stopword_en', CAST(n3 AS BIGINT),
                     CAST(t3 AS BIGINT) FROM w
    UNION ALL SELECT 4, 'repetition', CAST(n4 AS BIGINT),
                     CAST(t4 AS BIGINT) FROM w
    """,
    doc="D6: Gopher-style filter-funnel audit (Rae et al. 2021 A1.1) — "
    "per cumulative filter stage, surviving docs and token mass, from ONE "
    "corpus scan and ONE 1-row aggregate (indicator sums fused into a "
    "single partial+final hash agg, stack() unpivot of the row) "
    "(operators/pipeline.py:quality_funnel).",
)
def d6_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.quality_funnel(read_testdata(spark, sf_dir, "documents"))


@register(
    "d6_blocklist_filter",
    oracle="""
    WITH u AS (
      SELECT source, n_chars,
             'https://' || source || '.docs.example/doc/' || doc_id AS url
      FROM documents),
    h AS (
      SELECT source, n_chars,
             regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
      FROM u)
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM h
    WHERE host NOT IN ('src3.docs.example', 'src7.docs.example',
                       'src11.docs.example')
    GROUP BY source
    """,
    doc="D6 (URL/domain blocklist): the standard pretraining provenance "
    "filter — derive each document's host (parse_url builtin over the "
    "reconstructed source URL), drop documents whose host is on a "
    "blocklist via a broadcast LEFT ANTI join (the blocklist is a "
    "curated dim: bounded, broadcast by construction — never a filter "
    "pushed through a corpus-sized IN-list), and report surviving "
    "volume per source. Oracle replays the host parse with an anchored "
    "regex (verified byte-identical to parse_url).",
)
def d6_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    blocked_hosts = [
        "src3.docs.example", "src7.docs.example", "src11.docs.example",
    ]
    docs = read_testdata(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".docs.example/doc/"),
        F.col("doc_id"),
    )
    blocklist = spark.createDataFrame(
        [(h,) for h in blocked_hosts], "host STRING"
    )
    kept = (
        docs.withColumn("host", F.parse_url(url, F.lit("HOST")))
        .join(F.broadcast(blocklist), "host", "left_anti")
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "d6_temperature_mix",
    oracle="""
    WITH t AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(list_filter(string_split(text, ' '),
                  x -> x <> ''))) AS BIGINT) AS total_tokens
      FROM documents GROUP BY source),
    p AS (
      SELECT t.*,
             pow(total_tokens / (SELECT sum(total_tokens) FROM t), 0.5)
               AS pa
      FROM t),
    w AS (SELECT p.*, pa / (SELECT sum(pa) FROM p) AS w FROM p),
    m AS (SELECT w.*, (SELECT min(total_tokens / w) FROM w) AS cap FROM w)
    SELECT source, n_docs, total_tokens,
           round(w, 6) AS target_weight,
           round(least(1.0, cap * w / total_tokens), 6) AS keep_rate
    FROM m
    """,
    doc="D6: TEMPERATURE-scaled domain mixing (alpha = 0.5) — the "
    "multilingual-pretraining sampling rule: target weight ~ "
    "(T_s/T)^alpha normalized (upweights low-resource domains), then "
    "the water-fill realizes the largest corpus with that exact mix. "
    "Same one-shuffle scale shape as d6_domain_mix; alpha=1 is the "
    "natural distribution, alpha->0 the uniform mix "
    "(operators/pipeline.py:temperature_mix).",
)
def d6_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.temperature_mix(
        read_testdata(spark, sf_dir, "documents"), alpha=0.5
    )


@register(
    "d6_chunk_documents",
    oracle="""
    WITH tokl AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    idx AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(range(0,
               greatest(CAST(ceil((len(toks) - 16) / 12.0) AS BIGINT) + 1,
                        1))) AS c
      FROM tokl)
    SELECT doc_id, c AS chunk_idx,
           array_to_string(
             toks[CAST(c*12+1 AS INT):CAST(least(c*12+16, n) AS INT)],
             ' ') AS chunk_text,
           CAST(least(c*12+16, n) - c*12 AS BIGINT) AS n_tokens
    FROM idx
    """,
    doc="D6 (chunking): overlapping token-window segmentation — 16-token "
    "windows, stride 12 (4-token overlap), the context-window chunking "
    "step upstream of embedding generation and sequence packing "
    "(operators/pipeline.py:chunk_documents). Pure codegen "
    "split/sequence/explode/slice, zero exchanges; row count ~ "
    "corpus_tokens/stride. Edge contract pinned on both sides: every "
    "token covered, final chunk never empty, sub-window docs yield "
    "exactly one chunk.",
)
def d6_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    return P.chunk_documents(docs, window=16, stride=12)


@register(
    "d6_length_histogram",
    oracle="""
    WITH t AS (
      SELECT source,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tokens
      FROM documents)
    SELECT source,
           CAST(length(bin(greatest(n_tokens, 1))) - 1 AS BIGINT)
             AS len_bucket_log2,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM t GROUP BY source, len_bucket_log2
    """,
    doc="D6 (sequence-length profile): per-source histogram of document "
    "token counts in power-of-two buckets — the distribution that sizes "
    "pack_sequences' window, sets truncation budgets, and flags "
    "length-outlier sources before training. The log2 bucket is "
    "INTEGER-exact on both engines via binary-representation length "
    "(length(bin(n)) - 1 == floor(log2 n)) — float log2 at exact powers "
    "of two is engine-dependent in the last ulp and would flip buckets. "
    "One codegen projection + one map-side-combined aggregate; at "
    "100 TB this is a metadata-cost pass over the corpus.",
)
def d6_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = read_testdata(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    ).cast("bigint")
    t = docs.select("source", n_tokens.alias("n_tokens"))
    bucket = (
        F.length(F.bin(F.greatest(F.col("n_tokens"), F.lit(1)))) - 1
    ).cast("bigint")
    return t.groupBy("source", bucket.alias("len_bucket_log2")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens_total"),
        F.min("n_tokens").cast("bigint").alias("min_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )


@register(
    "d6_negative_pairs",
    oracle="""
    WITH n AS (SELECT greatest(count(*) // 8, 1) AS nb FROM documents),
    b AS (
      SELECT doc_id,
             ((doc_id % 2147483648) * 2654435761 + 104729)
               % 2147483647 % nb AS rb
      FROM documents, n),
    probes AS (
      SELECT d.doc_id AS anchor, i,
             ((d.doc_id % 2147483648) * 40503 + i * 69061 + 12345)
               % 2147483647 % nb AS tb
      FROM documents d, n, unnest(range(4)) AS t(i)),
    cand AS (
      SELECT p.anchor, p.i AS probe_idx, b.doc_id AS cand_id,
             (((b.doc_id % 2147483648) * 48271 + 777) % 2147483647)
               * 2147483648 + (b.doc_id % 2147483648) AS ord
      FROM probes p JOIN b ON b.rb = p.tb
      WHERE b.doc_id <> p.anchor)
    SELECT anchor, CAST(probe_idx AS BIGINT) AS probe_idx,
           arg_min(cand_id, ord) AS partner
    FROM cand GROUP BY anchor, probe_idx
    """,
    doc="D6 (contrastive negatives): k=4 deterministic pseudo-random "
    "negative partners per anchor via BUCKETED GATHER "
    "(operators/pipeline.py:negative_pairs) — bucket count scales with "
    "corpus size so occupancy stays ~8 docs and the join output stays "
    "linear (k x occupancy x N), never a per-anchor global shuffle or "
    "cartesian. Integer-LCG derivation makes the sample bit-exact under "
    "the oracle; production swaps LCG for xxhash64 (same topology, the "
    "minhash id_mode trade).",
)
def d6_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    return P.negative_pairs(docs, k=4, per_bucket=8)


@register(
    "d6_ppl_buckets",
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
      FROM tok JOIN v USING (token) CROSS JOIN tot),
    scored AS (
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(lp) AS BIGINT) AS lp_sum
      FROM s GROUP BY doc_id),
    ranked AS (
      SELECT d.doc_id, d.lang,
             sc.lp_sum * 1.0 / sc.n_tokens AS avg_lp,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY sc.lp_sum * 1.0 / sc.n_tokens DESC,
                                     d.doc_id) AS t
      FROM documents d JOIN scored sc ON d.doc_id = sc.doc_id)
    SELECT doc_id, lang,
           CAST(floor(avg_lp) AS BIGINT) AS avg_lp_micros,
           CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket,
           t <= 2 AS keep
    FROM ranked
    """,
    doc="D6 (CCNet perplexity bucketing, Wenzek et al. 2020): per-LANGUAGE "
    "LM-score terciles — head/middle/tail by average token log-prob "
    "(higher = lower perplexity), with the paper's keep rule "
    "(head+middle). Composes the oracled unigram LM "
    "(operators/text.py:unigram_logprob, integer-micros exact) with one "
    "ntile window PARTITIONED BY lang — per-language parallelism at any "
    "corpus size, no global sort; ordering ties break on doc_id so the "
    "tercile cut is total. This is the quality-stratification step "
    "CCNet actually ships between LM scoring and sampling.",
)
def d6_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.text import unigram_logprob

    docs = read_testdata(spark, sf_dir, "documents")
    scored = unigram_logprob(docs).select(
        "doc_id",
        (F.col("logprob_micros") * 1.0 / F.col("n_tokens")).alias("avg_lp"),
    )
    joined = docs.select("doc_id", "lang").join(scored, "doc_id")
    w = W.partitionBy("lang").orderBy(F.desc("avg_lp"), F.col("doc_id"))
    t = F.ntile(3).over(w)
    return joined.select(
        "doc_id",
        "lang",
        F.floor("avg_lp").cast("bigint").alias("avg_lp_micros"),
        F.when(t == 1, "head").when(t == 2, "middle").otherwise("tail")
        .alias("ppl_bucket"),
        (t <= 2).alias("keep"),
    )


@register(
    "d6_crossdomain_lm",
    oracle="""
    WITH train AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS token
      FROM documents
      WHERE source IN ('src0','src1','src2','src3','src4')),
    v AS (SELECT token, count(*) AS cnt FROM train GROUP BY token),
    tot AS (SELECT count(*) AS total FROM train),
    s_toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS token
      FROM documents
      WHERE source NOT IN ('src0','src1','src2','src3','src4')),
    scored AS (
      SELECT s.doc_id,
             v.cnt IS NULL AS oov,
             CASE WHEN v.cnt IS NULL THEN -20723266
                  ELSE CAST(floor(ln(CAST(v.cnt AS DOUBLE) / t.total)
                                  * 1000000 + 0.5) AS BIGINT)
             END AS lp
      FROM s_toks s LEFT JOIN v USING (token) CROSS JOIN tot t)
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(sum(lp) AS BIGINT) AS logprob_micros,
           CAST(floor(CAST(sum(lp) AS DOUBLE) / count(*)) AS BIGINT)
             AS avg_lp_micros
    FROM scored GROUP BY doc_id
    """,
    doc="D6 (cross-domain LM scoring — CCNet's deployment shape, Wenzek "
    "et al. 2020): the unigram model trains on a clean REFERENCE subset "
    "(sources src0-4) and scores the REST "
    "(operators/text.py:crossdomain_lm_score) — unlike the self-trained "
    "d4_lm_logprob, this separates 'fluent under the reference' from "
    "'typical of itself', which is the signal CCNet filters on. "
    "OOV tokens get a LITERAL integer penalty (no cross-engine "
    "transcendental) and an explicit per-doc count — high OOV rate is "
    "itself a quality flag. Same integer-micros exactness and plain "
    "equi-join probe (AQE decides broadcast) as the self-trained form.",
)
def d6_crossdomain_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.text import crossdomain_lm_score

    docs = read_testdata(spark, sf_dir, "documents")
    ref = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    return crossdomain_lm_score(docs.filter(ref), docs.filter(~ref))


@register(
    "d6_global_shuffle",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             (doc_id * 2654435761 + 40503) % 2147483648 AS perm
      FROM documents)
    SELECT doc_id, CAST(perm % 64 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY perm % 64 ORDER BY perm)
                AS BIGINT) AS pos
    FROM p
    """,
    doc="D6 (training-order shuffle): deterministic GLOBAL SHUFFLE of "
    "the corpus into 64 shards with a pseudorandom within-shard order — "
    "the step between curation and training (data order is a training "
    "hyperparameter; it must be reproducible). The permutation key is "
    "an odd-multiplier LCG mod 2^31 — injective by construction (odd "
    "multiplier, power-of-two modulus), so the order is total with no "
    "tie-break needed, and any engine states the identical shuffle. "
    "Engine shape: ONE window partitioned by shard (64-way parallel "
    "row_number, never a global sort) — at 100 TB the shuffle order "
    "materializes shard-by-shard with bounded per-task state, which a "
    "true random sort cannot do reproducibly.",
)
def d6_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id")
    perm = (F.col("doc_id") * 2654435761 + 40503) % F.lit(2147483648)
    p = docs.select("doc_id", perm.alias("perm"))
    w = W.partitionBy(F.col("perm") % 64).orderBy("perm")
    return p.select(
        "doc_id",
        (F.col("perm") % 64).cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@register(
    "d6_quality_classifier",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    w AS (
      SELECT doc_id, len(toks) AS n_tokens,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT), list_transform(toks,
                 tok -> ((list_reduce(
                            list_prepend(CAST(0 AS BIGINT),
                              list_transform(
                                list_filter(
                                  string_split(hex(encode(tok)), ''),
                                  c -> c <> ''),
                                c -> CAST(ascii(c) AS BIGINT))),
                            (acc, c) -> (acc * 31 + c) % 1000000007)
                           % 512) * 2654435761 + 12345)
                        % 2147483647 % 7 - 3)),
               (a, x) -> a + x) AS score_sum
      FROM t)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           score_sum, score_sum >= 0 AS keep
    FROM w
    """,
    doc="D6 (model-based quality filter): fastText-style hashed linear "
    "classifier scoring — the GPT-3 / FineWeb-Edu quality-filter "
    "deployment shape (operators/text.py:hashed_linear_score): token -> "
    "hashing-trick bucket -> weight, keep = score >= 0. Weights are a "
    "deterministic LCG of the bucket (trained weights swap in as a "
    "broadcast lookup; the scoring plumbing is what's exercised). The "
    "whole scorer is ONE zero-exchange codegen projection via nested "
    "higher-order functions — no explode, no vocabulary join, no "
    "shuffle — the only plan shape whose cost stays per-row when the "
    "corpus is 100 TB. Both engines state the identical integer fold, "
    "so the driver check is bit-exact.",
)
def d6_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.text import hashed_linear_score

    docs = read_testdata(spark, sf_dir, "documents")
    return hashed_linear_score(docs, n_buckets=512)


#: fertility oracle: the GENERATED 5-merge encode chain (one statement)
#: wrapped as a subquery and rolled up per language — reusing the
#: generator keeps the training chain in exactly one place.
from citydata_etl_spark.plans.queries_llm import (  # noqa: E402
    _bpe_encode_oracle as _fertility_encode_oracle,
)

_FERTILITY_ORACLE = f"""
    SELECT d.lang,
           count(*) AS n_docs,
           CAST(sum(enc.n_bpe_tokens) * 10000 // sum(enc.n_words)
                AS BIGINT) AS fertility_bp,
           CAST(sum(enc.n_chars) * 10000 // sum(enc.n_bpe_tokens)
                AS BIGINT) AS chars_per_token_bp
    FROM ({_fertility_encode_oracle(5)}) enc
    JOIN documents d USING (doc_id)
    GROUP BY d.lang
"""


@register(
    "d6_tokenizer_fertility",
    oracle=_FERTILITY_ORACLE,
    doc="D6 (tokenizer QUALITY metric): per-language FERTILITY of the "
    "trained BPE tokenizer — BPE tokens per word and characters per "
    "BPE token, both in exact basis points (true integer division; "
    "the 2^53 rule). Fertility is THE number a multilingual pipeline "
    "watches when it evaluates a tokenizer: a language whose "
    "fertility runs high is being over-segmented (its effective "
    "context window shrinks and its per-token training cost rises), "
    "which drives vocabulary re-balancing — this row makes that "
    "dashboard driver-checkable. Composition: the d4_bpe_encode "
    "per-document budgets (trained 5-merge chain, one statement "
    "generated by the same _bpe_encode_oracle both entries share) "
    "joined to the language column and rolled up per lang — one "
    "corpus-sized token count inherited from the encoder, then "
    "lang-cardinality work. At 100 TB: nothing new beyond the "
    "encoder's own plan plus one small shuffle.",
)
def d6_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.text import bpe_encode

    docs = read_testdata(spark, sf_dir, "documents")
    enc = bpe_encode(docs, n_steps=5)
    return (
        enc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("(sum(n_bpe_tokens) * 10000) div sum(n_words)")
            .cast("bigint").alias("fertility_bp"),
            F.expr("(sum(n_chars) * 10000) div sum(n_bpe_tokens)")
            .cast("bigint").alias("chars_per_token_bp"),
        )
    )


@register(
    "d6_dataset_card",
    oracle="""
    WITH t AS (
      SELECT source, lang, text,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tok
      FROM documents),
    card AS (
      SELECT source,
             count(*) AS n_docs,
             count(DISTINCT text) AS n_unique_texts,
             CAST((count(*) - count(DISTINCT text)) * 10000
                  // count(*) AS BIGINT) AS dup_bp,
             count(DISTINCT lang) AS n_langs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(sum(length(text)) AS BIGINT) AS n_chars,
             CAST(sum(n_tok) // count(*) AS BIGINT) AS mean_tokens
      FROM t GROUP BY source),
    m AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_media,
             CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_bmp,
             CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_png,
             CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_decoded,
             CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) * 10000
                  // count(*) AS BIGINT) AS decode_fail_bp,
             CAST(sum(CASE WHEN doc_id % 7 <> 0
                      THEN (4 + doc_id % 5) * (3 + doc_id % 4)
                      ELSE 0 END) AS BIGINT) AS n_media_pixels
      FROM documents GROUP BY source)
    SELECT card.*, m.n_media, m.n_bmp, m.n_png, m.n_decoded,
           m.decode_fail_bp, m.n_media_pixels
    FROM card JOIN m USING (source)
    """,
    doc="D6 (release datasheet): the per-source DATASET CARD a curation "
    "pipeline publishes with every corpus release — document count, "
    "exact-duplicate rate in basis points (floor(int/int)), language "
    "spread, token/char volume, mean document length, PLUS the "
    "multimodal block a mixed-media release reports: media counts, "
    "format mix (bmp/png from MAGIC BYTES, never declared type), "
    "decode success from the REAL 24-bpp decode (bmp_pixel_stats — "
    "n_decoded counts images whose pixels actually parsed), "
    "decode-failure basis points, and total decoded pixels. The "
    "oracle states the media block in closed form from the fixture "
    "arithmetic, so a sniff or decoder regression shifts the card and "
    "hash-fails. One shuffle per grain (docs by source; media by "
    "source), joined on the handful of source rows; the two DISTINCT "
    "aggregates plan as a single Expand pass. At 100 TB substitute "
    "countDistinct(sha2(text,256)) for the raw text distinct so the "
    "distinct state carries 32-byte digests instead of documents. "
    "Companion to d4_dedup_report (dup attribution) and "
    "d6_shard_stats (physical shards).",
)
def d6_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.multimodal import bmp_pixel_stats
    from citydata_etl_spark.plans.queries_llm import _bmp_media_fixture

    docs = read_testdata(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(F.split("text", " "), lambda x: x != "")
    ).cast("bigint")
    base = docs.select("source", "lang", "text", n_tok.alias("n_tok"))
    card = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_unique_texts"),
        F.expr(
            "((count(*) - count(DISTINCT text)) * 10000) div count(*)"
        ).cast("bigint").alias("dup_bp"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.expr("sum(n_tok) div count(*)").cast("bigint").alias("mean_tokens"),
    )
    # media block: format from magic bytes, decode success from the
    # REAL decode — the oracle's closed form cross-checks both.
    # The fixture blobs are persisted (r18): the magic-byte projection
    # and the pixel decode are two consumers, and without the persist
    # each re-ran the per-blob SYNTH Python pass (~0.45 s). Fixture-
    # local posture: at deployment blobs are re-read from storage, and
    # the two consumers fuse into one scan; here the "storage" is a
    # mapInPandas synthesizer, so the cache plays the storage role
    # (~1 MB at sf0.1 — blob payloads stay bounded by the fixture).
    from citydata_etl_spark.caching import scoped_persist

    media = scoped_persist(_bmp_media_fixture(spark, sf_dir))
    head = F.hex(F.substring(F.col("content"), 1, 8))
    fmt = (
        F.when(head.startswith("424D"), F.lit("bmp"))
        .when(head == "89504E470D0A1A0A", F.lit("png"))
        .otherwise(F.lit("unknown"))
    )
    decoded = bmp_pixel_stats(media).select("media_id", "n_pixels")
    magg = (
        media.select("media_id", fmt.alias("fmt"))
        .join(decoded, "media_id")
        .join(
            docs.select(F.col("doc_id").alias("media_id"), "source"),
            "media_id",
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_media"),
            F.sum((F.col("fmt") == "bmp").cast("int"))
            .cast("bigint").alias("n_bmp"),
            F.sum((F.col("fmt") == "png").cast("int"))
            .cast("bigint").alias("n_png"),
            F.sum(F.col("n_pixels").isNotNull().cast("int"))
            .cast("bigint").alias("n_decoded"),
            F.expr(
                "(sum(CASE WHEN n_pixels IS NULL THEN 1 ELSE 0 END)"
                " * 10000) div count(*)"
            ).cast("bigint").alias("decode_fail_bp"),
            F.sum(F.coalesce(F.col("n_pixels"), F.lit(0)))
            .cast("bigint").alias("n_media_pixels"),
        )
    )
    return card.join(magg, "source")


@register(
    "d6_dsir_select",
    oracle="""
    WITH splits AS (
      SELECT doc_id,
             CASE WHEN source IN ('src0','src1','src2','src3','src4')
                  THEN 0 ELSE 1 END AS side,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    eligible AS (SELECT * FROM splits WHERE len(toks) >= 2),
    idx AS (
      SELECT doc_id, side, toks,
             unnest(range(1, len(toks))) AS i
      FROM eligible),
    gr AS (
      SELECT doc_id, side,
             toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)]
               AS token
      FROM idx),
    vocab AS (
      SELECT token, row_number() OVER (ORDER BY token) - 1 AS tid
      FROM (SELECT DISTINCT token FROM gr)),
    bk AS (
      SELECT g.doc_id, g.side,
             CAST((v.tid * 2654435761 + 11) % 2147483647 % 256 AS INT)
               AS bucket
      FROM gr g JOIN vocab v USING (token)),
    pb AS (
      SELECT bucket,
             sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ct,
             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cr
      FROM bk GROUP BY bucket),
    tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM pb),
    wt AS (
      SELECT bucket,
             CAST(floor((ln(CAST(ct + 1 AS DOUBLE))
                         - ln(CAST(tt + 256 AS DOUBLE))
                         - ln(CAST(cr + 1 AS DOUBLE))
                         + ln(CAST(tr + 256 AS DOUBLE)))
                        * 1000000 + 0.5) AS BIGINT) AS w_micros
      FROM pb CROSS JOIN tot),
    sc AS (
      SELECT b.doc_id, count(*) AS n_grams,
             CAST(sum(w_micros) AS BIGINT) AS weight_micros
      FROM bk b JOIN wt USING (bucket)
      WHERE side = 1 GROUP BY b.doc_id),
    keyed AS (
      SELECT doc_id, n_grams, weight_micros,
             weight_micros + CAST(floor(
               -ln(-ln(((doc_id * 2654435761 + 7 * 40503 + 11)
                        % 2147483647 + 1) / 2147483649.0))
               * 1000000 + 0.5) AS BIGINT) AS key_micros
      FROM sc),
    rk AS (
      SELECT *, row_number()
               OVER (ORDER BY key_micros DESC, doc_id) AS r
      FROM keyed)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           weight_micros, key_micros,
           CAST(CASE WHEN r <= 200 THEN 1 ELSE 0 END AS BIGINT)
             AS selected
    FROM rk
    """,
    doc="D6 (DSIR data selection — Xie et al. 2023, importance "
    "resampling): estimate bag-of-hashed-bigram distributions for the "
    "clean TARGET subset (the reference sources src0-4, the same "
    "reference/pool split as d6_crossdomain_lm) and the RAW candidate "
    "pool, weight every candidate by the Laplace-smoothed log "
    "importance ratio of its grams (per-bucket ratio rounded ONCE to "
    "integer micros; per-doc weights associative BIGINT sums), and "
    "select k=200 via the Gumbel-top-k trick with a seeded-LCG "
    "uniform — sampling without replacement proportional to the "
    "importance weight, deterministic for the oracle "
    "(operators/pipeline.py:dsir_importance). Feature hashing keys on "
    "the dense lexicographic gram rank through an LCG into 256 "
    "buckets (oracle-exact; swap rank for xxhash64 at corpus scale, "
    "the minhash id_mode='hash' convention). Scale shape: gram "
    "explode + ranked_tokens' one-exchange rank; bucket counts "
    "collapse map-side into <=256 rows; the weight table broadcasts; "
    "one hash aggregate per doc; selection is "
    "TakeOrderedAndProject(k) joined back as a flag — no corpus-wide "
    "window, no collect.",
)
def d6_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = read_testdata(spark, sf_dir, "documents")
    ref = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    return P.dsir_importance(
        docs.filter(ref), docs.filter(~ref),
        n_buckets=256, k=200, seed=7,
    )


@register(
    "d6_dsir_select_hash",
    oracle=None,  # engine-specific by construction: buckets key on
    # Spark's xxhash64 over the gram bytes, which no external SQL
    # engine restates; d6_dsir_select is the oracle-exact twin with
    # identical topology (only the bucket projection differs), and
    # test_dsir_feature_modes_overlap pins that both modes select
    # overlapping top sets on planted data.
    doc="D6 (r16 VERDICT task 5): DSIR's CORPUS-SCALE feature path "
    "under a driver row — feature_mode='hash' buckets each bigram via "
    "pmod(xxhash64(gram), prime) % n_buckets straight off the gram "
    "bytes, eliminating the vocabulary distinct + global dense rank "
    "that the oracle-exact rank mode pays (a full-corpus exchange a "
    "100 TB vocabulary cannot afford — the same swap "
    "minhash_lsh_pairs ships as id_mode='hash'). Everything past the "
    "bucket projection is the identical DSIR chain: map-side-collapsed "
    "bucket counts, broadcast weight table, per-doc BIGINT weight "
    "sums, seeded-Gumbel top-k via TakeOrderedAndProject "
    "(operators/pipeline.py:dsir_importance). Rows-only by "
    "construction (xxhash64); the driver still gates rows + schema, "
    "and the rank-mode twin d6_dsir_select carries the bit-exact "
    "oracle for the shared chain.",
)
def d6_dsir_select_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = read_testdata(spark, sf_dir, "documents")
    ref = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    return P.dsir_importance(
        docs.filter(ref), docs.filter(~ref),
        n_buckets=256, k=200, seed=7, feature_mode="hash",
    )
