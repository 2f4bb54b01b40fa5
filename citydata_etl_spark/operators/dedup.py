"""Deduplication operators for training-data pipelines (SURVEY.md §2.8 D4).

All-builtin implementations (no Python in the row path):
  - exact_dedup: hash-groupBy on the content column.
  - ngram_jaccard_pairs: exact n-gram Jaccard via shingle explode +
    self-join on shared shingles — the exact (quadratic-in-collisions)
    baseline.
  - minhash_lsh_pairs: MinHash signatures + LSH banding — the scale path:
    cost is linear in corpus size + band-bucket collisions, never all-pairs.
  - simhash_fingerprints / simhash_pairs: 31-bit SimHash + hamming filter.

Determinism: token ids come from a dense rank over the global vocabulary and
hash functions are integer LCGs mod a Mersenne-ish prime — pure integer
arithmetic reproduces bit-identically in any engine (this is what lets the
DuckDB oracle verify MinHash-LSH exactly). At 100 TB the vocabulary
dense-rank (one global sort over DISTINCT tokens — small by Heaps' law)
would be replaced by xxhash64(token), trading oracle-exactness for zero
global coordination; the banding/bucketing topology is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

HASH_PRIME = 2147483647  # 2^31 - 1


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: one row per distinct text with the canonical
    (minimum) id and the duplicate count. A shuffle on the text hash; at
    scale, group on sha2(text) instead of raw text to shrink shuffle width.
    """
    return docs.groupBy(text_col).agg(
        F.min(id_col).alias("canonical_id"),
        F.count("*").alias("n_dups"),
    )


def tokens(docs: DataFrame, text_col: str = "text",
           id_col: str = "doc_id", distinct: bool = True) -> DataFrame:
    """(id, token) pairs from whitespace tokenization."""
    t = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    return t.distinct() if distinct else t


def vocabulary(tok: DataFrame) -> DataFrame:
    """Dense token ids by global lexicographic rank.

    The single-partition window is over DISTINCT tokens only (vocabulary,
    not corpus) — bounded by Heaps' law; swap for xxhash64 at extreme scale.
    """
    return tok.select("token").distinct().withColumn(
        "tid", F.row_number().over(W.orderBy("token")) - 1
    )


def shingles(docs: DataFrame, n: int, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")
    )
    return (
        docs.select(F.col(id_col), F.explode(grams).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs above a threshold.

    Inverted-index join: docs sharing at least one shingle are candidates
    (|intersection| from the join's group count, |union| = |A|+|B|-|I|).
    Never materializes the full cross product — only pairs that share a
    shingle, which is the standard exact-Jaccard plan at scale.
    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sh = shingles(docs, n, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sz_a = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .withColumn(
            "jaccard",
            F.col("i").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("i")),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def _hash_params(spark, num_hashes: int) -> DataFrame:
    """num_hashes integer LCG hash functions h_i(x) = (a_i*x + b_i) mod P."""
    rows = [
        (i, (i * 2654435761 + 1) % HASH_PRIME, (i * 40503 + 7) % HASH_PRIME)
        for i in range(num_hashes)
    ]
    return spark.createDataFrame(rows, "i INT, a BIGINT, b BIGINT")


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 16,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signatures over token ids: (id, i, h) with
    h = min over tokens of (a_i*tid + b_i) mod P."""
    spark = docs.sparkSession
    tok = tokens(docs, text_col, id_col)
    vocab = vocabulary(tok)
    tt = tok.join(F.broadcast(vocab), "token").select(id_col, "tid")
    hp = _hash_params(spark, num_hashes)
    return (
        tt.crossJoin(F.broadcast(hp))
        .groupBy(id_col, "i")
        .agg(F.min((F.col("a") * F.col("tid") + F.col("b")) % HASH_PRIME).alias("h"))
    )


def minhash_lsh_pairs(
    docs: DataFrame, num_hashes: int = 16, band_size: int = 4,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate pairs: docs whose minhash signatures agree on every row
    of at least one band. Output: (doc_a, doc_b), doc_a < doc_b.

    Scale shape: groupBy band-signature then join — cost follows bucket
    collisions, not corpus^2. Skewed buckets (boilerplate text) are the
    known hazard; AQE skew-join or a bucket-size cap handles them.
    """
    mh = minhash_signatures(docs, num_hashes, text_col, id_col)
    sig = (
        mh.withColumn("band", F.expr(f"i div {band_size}"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "h"))),
                    lambda x: x["h"].cast("string"),
                ),
                ",",
            ).alias("sig")
        )
    )
    a = sig.select(F.col(id_col).alias("doc_a"), "band", "sig")
    b = sig.select(F.col(id_col).alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash_fingerprints(
    docs: DataFrame, bits: int = 31,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """31-bit SimHash from token-id LCG hashes: bit j of the fingerprint is
    set iff sum over tokens of (2*bit_j(h(tid)) - 1) > 0.

    Integer-only → oracle-reproducible. Output: (id, fingerprint BIGINT).
    """
    tok = tokens(docs, text_col, id_col)
    vocab = vocabulary(tok)
    tt = tok.join(F.broadcast(vocab), "token").select(id_col, "tid")
    h = (F.col("tid") * 2654435761 + 104729) % HASH_PRIME
    bit_idx = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j")
    per_bit = tt.select(F.col(id_col), h.alias("h")).select(
        id_col, "h", bit_idx
    ).select(
        id_col,
        "j",
        # shiftright with a column bit-count needs the SQL form (the Python
        # wrapper only takes int literals)
        (F.expr("shiftright(h, CAST(j AS INT))").bitwiseAND(1) * 2 - 1
         ).alias("s"),
    )
    votes = per_bit.groupBy(id_col, "j").agg(F.sum("s").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("v") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("fingerprint")
    )


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 6,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    All-pairs over fingerprints (one BIGINT per doc — tiny); at corpus
    scale, block on fingerprint prefixes first (pigeonhole: some 8-bit
    chunk must match exactly when hamming <= 3 over 4 chunks).
    """
    fp = simhash_fingerprints(docs, text_col=text_col, id_col=id_col)
    a = fp.select(F.col(id_col).alias("doc_a"), F.col("fingerprint").alias("fa"))
    b = fp.select(F.col(id_col).alias("doc_b"), F.col("fingerprint").alias("fb"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
