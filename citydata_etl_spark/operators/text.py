"""Text analysis operators for training-data pipelines (D4 [north-star]).

All builtin expressions (codegen'd): token counting, quality scoring,
language ID (stopword-ratio heuristic), document fingerprinting (rolling
hash over token ids). Pure integer/rational arithmetic everywhere an oracle
compares values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Tiny English stopword list for the language-ID heuristic.
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"]

FINGERPRINT_MOD = 1000000007


def hex_fold_hash(s) -> "F.Column":
    """Engine-portable string hash: fold (acc*31 + c) % FINGERPRINT_MOD
    over the chars of hex(utf8_bytes(s)). Hashing the HEX SPELLING of
    the UTF-8 bytes (pure ASCII in every engine) instead of raw chars
    sidesteps the supplementary-plane divergence where Spark's
    split('')/ascii() walks UTF-16 code units but SQL engines walk
    codepoints. Shared by the quality scorer and winnowing — one
    definition, one oracle idiom."""
    return F.aggregate(
        F.transform(
            F.filter(F.split(F.hex(F.encode(s, "UTF-8")), ""),
                     lambda c: c != ""),
            lambda c: F.ascii(c).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD,
    )


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc token statistics: token count, char count, whitespace ratio,
    mean token length — the quality-scoring raw features."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_spaces = n_chars - F.length(F.regexp_replace(text_col, " ", ""))
    return docs.select(
        id_col,
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_text"),
        (n_spaces.cast("double") / n_chars).alias("space_ratio"),
        (
            (n_chars - n_spaces).cast("double") / n_tokens
        ).alias("mean_token_len"),
    )


def quality_expr(text_col: str = "text"):
    """Quality score as a bare Column expression — composable into a
    single-scan pipeline (no self-join needed to attach quality to a
    corpus; see operators/pipeline.py:curation_summary)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_spaces = n_chars - F.length(F.regexp_replace(text_col, " ", ""))
    mean_token_len = (n_chars - n_spaces).cast("double") / n_tokens
    len_score = F.least(n_tokens.cast("double") / 50.0, F.lit(1.0))
    shape_score = F.when(
        (mean_token_len >= 2.0) & (mean_token_len <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return len_score * shape_score


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0,1]: length saturation x token-shape
    sanity. Deterministic rational arithmetic (oracle-exact)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    return docs.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        quality_expr(text_col).alias("quality"),
    )


def lang_ratio_expr(text_col: str = "text"):
    """English-stopword token share as a bare Column expression."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw.cast("double") / F.size(toks)


def lang_pred_expr(text_col: str = "text", threshold: float = 0.05):
    """Language prediction ('en'/'unknown') as a bare Column expression."""
    return (
        F.when(lang_ratio_expr(text_col) >= threshold, "en")
        .otherwise("unknown")
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", threshold: float = 0.05) -> DataFrame:
    """Stopword-ratio language ID: share of tokens in the English stopword
    list; >= threshold -> 'en'. N-gram-free heuristic that stays entirely
    in builtin array functions."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return docs.select(
        id_col,
        n_sw.alias("n_stopwords"),
        F.size(toks).alias("n_tokens"),
        F.round(lang_ratio_expr(text_col), 6).alias("stopword_ratio"),
        lang_pred_expr(text_col, threshold).alias("lang_pred"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling-hash fingerprint over token ids:
    fp = fold(tokens, acc -> (acc*31 + tid) mod 1e9+7).

    Token ids come from the dense lexicographic rank computed IN PLACE on
    the (id, pos, token) rows (dedup.ranked_tokens — dense_rank within a
    prefix bucket + distinct-count offsets, no separate vocabulary join),
    so the fingerprint is engine-reproducible. Position is preserved via
    posexplode -> sort — unlike a set hash, reordered documents get
    different prints.
    """
    from citydata_etl_spark.caching import scoped_persist
    from citydata_etl_spark.operators.dedup import ranked_tokens

    pos_tok = scoped_persist(
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"),
        ).filter(F.col("token") != "")
    )  # scanned twice by ranked_tokens (bucket counts, then ranking)
    seq = (
        ranked_tokens(pos_tok)
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda x: x["tid"],
            ).alias("tids")
        )
    )
    fp = F.aggregate(
        F.col("tids"),
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 31 + t) % FINGERPRINT_MOD,
    )
    return seq.select(id_col, fp.alias("fingerprint"))


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, shingle_n: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per doc by TF-IDF over word n-grams:
    (doc_id, term, tf, df, tfidf, rnk).

    tfidf = round(tf * ln(N/df), 6) — integer tf/df, one transcendental
    rounded to a fixed scale; ranking orders by the ROUNDED score with a
    term tie-break so the cut is total and engine-portable. Bigram terms
    (shingle_n=2) keep the scores discriminative on small-vocabulary
    corpora, where every unigram's df ~= N and unigram TF-IDF collapses
    to zero.

    Plan shape: one bag-semantics shingle explode -> (doc, term) count;
    document frequency attaches as a COUNT WINDOW partitioned by term —
    no join, no second pass over the corpus, no corpus-dependent
    broadcast: one exchange on term computes df alongside the tf rows it
    describes (tf is unique per (doc, term), so count(*) over the term
    partition IS df). Then the 1-row corpus count (broadcast cross join)
    and one ranking window partitioned by doc. The corpus is exchanged
    exactly three times — (doc, term), term, doc — each partitioned, all
    map-side combinable where applicable.
    """
    from pyspark.sql import Window as W

    from citydata_etl_spark.operators.dedup import shingles

    sh = shingles(docs, shingle_n, text_col, id_col, distinct=False)
    tf = sh.groupBy(id_col, "shingle").agg(F.count("*").alias("tf"))
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.withColumn(
            "df", F.count("*").over(W.partitionBy("shingle")).cast("bigint")
        )
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df")),
                6,
            ),
        )
    )

    rnk = F.row_number().over(
        W.partitionBy(id_col).orderBy(F.desc("tfidf"), "shingle")
    )
    return (
        scored.withColumn("rnk", rnk.cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select(
            id_col, F.col("shingle").alias("term"), "tf", "df", "tfidf", "rnk"
        )
    )


#: BPE-ish pre-tokenization: letter chunks (max 3, the "merge window"),
#: digit runs, or any single non-letter non-space symbol — a pure-ASCII
#: regex whose semantics agree between Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = "[a-zA-Z]{1,3}|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_token_count(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Subword ("BPE-ish") token counting via one regexp_extract_all pass —
    whitespace tokens from token_stats measure documents, subword tokens
    approximate LLM token budgets. Output: (id, n_subwords, n_words,
    subword_ratio). All codegen, no Python.
    """
    subs = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0))
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    return docs.select(
        F.col(id_col),
        F.size(subs).alias("n_subwords"),
        F.size(words).alias("n_words"),
        F.round(
            F.size(subs).cast("double") / F.size(words), 6
        ).alias("subword_ratio"),
    )


def repetition_stats(docs: DataFrame, n: int = 2, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals per doc (the duplicate-n-gram
    family of MassiveText's repetition filters — Rae et al. 2021, appendix
    A1.1 — adapted to token n-grams): n-gram bag size, distinct n-grams,
    duplicate-n-gram fraction, and top-n-gram share.

      dup_ngram_frac  = 1 - n_distinct / n_grams   (occurrences that repeat)
      top_ngram_share = top_count / n_grams        (mass of the modal gram)

    Scale shape: ONE shuffle on (doc, gram) with map-side partial counts,
    then a per-doc reduce that is itself map-side combinable (sum/count/max
    over rows already co-located by doc prefix of the same hash) — two hash
    aggs, no window, no join, never materializes a per-doc gram array.
    """
    from citydata_etl_spark.operators.dedup import shingles

    grams = shingles(docs, n, text_col, id_col, distinct=False)
    per_gram = grams.groupBy(id_col, "shingle").agg(F.count("*").alias("cnt"))
    return per_gram.groupBy(id_col).agg(
        F.sum("cnt").cast("bigint").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").cast("bigint").alias("top_count"),
    ).select(
        id_col,
        "n_grams",
        "n_distinct",
        "top_count",
        F.round(
            1.0 - F.col("n_distinct") / F.col("n_grams").cast("double"), 6
        ).alias("dup_ngram_frac"),
        F.round(
            F.col("top_count") / F.col("n_grams").cast("double"), 6
        ).alias("top_ngram_share"),
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020) with
    the cheapest possible LM — a unigram model trained on the corpus
    itself: per doc, total and average token log-probability.

    Determinism: each token's ln(cnt/total) is rounded HALF-UP to integer
    MICROS before summing — integer addition is associative, so partial
    aggregation order can't change a bit (a raw double sum would).

    Scale shape: the unigram vocabulary is corpus-TRAINED — bounded by
    language for clean text, but web-scale corpora carry unbounded noisy
    tokens (URLs, hashes), so the probe join carries NO broadcast hint:
    it is a plain equi-join co-partitioned with the vocabulary's own
    token exchange, and AQE broadcasts only when the trained table
    actually is small. The 1-row corpus total stays an explicit
    broadcast. The corpus explodes once and reduces per doc — one
    shuffle on (doc). In a real pipeline the LM side is trained once and
    reused; here it's derived in the same plan.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("token"),
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = toks.agg(F.count("*").alias("total"))
    lp_micros = F.floor(
        F.log(F.col("cnt").cast("double") / F.col("total")) * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    return (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(lp_micros).cast("bigint").alias("logprob_micros"),
        )
        .select(
            id_col,
            "n_tokens",
            "logprob_micros",
            # floor of the SAME double quotient is unambiguous in any
            # engine (no tie semantics) — round() is not: Spark's
            # HALF_UP on the exact binary value and DuckDB's round can
            # disagree by one ulp-digit on boundary quotients (found at
            # sf0.1). Average stays in exact integer micros.
            F.floor(
                F.col("logprob_micros").cast("double") / F.col("n_tokens")
            ).cast("bigint").alias("avg_lp_micros"),
        )
    )


def bigram_logprob(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", lam: float = 0.75) -> DataFrame:
    """Interpolated BIGRAM language-model scoring — the next step up from
    unigram_logprob toward CCNet's n-gram LM (Wenzek et al. 2020 use a
    5-gram KenLM; the interpolation-with-unigram backoff here is the same
    structure at order 2):

      p(w_i | w_{i-1}) = lam * (c2(w_{i-1}, w_i) / c1(w_{i-1}))
                       + (1-lam) * (c(w_i) / N)
      first token of a doc scores by the unigram term alone.

    Determinism: ln(p) is rounded HALF-UP to integer micros per token
    before summing (associative integer addition — same rule as
    unigram_logprob); the interpolation is evaluated with explicit
    parenthesization `lam * (c2/c1) + (1-lam) * (u/N)` so both engines
    round the same intermediate quotients.

    Scale shape: bigrams come from array slices of the per-doc token
    array (no window, no self-join on position); the c2/c1/unigram
    tables are corpus-trained, so every probe join is a PLAIN equi-join
    (no broadcast hints — AQE decides; same rationale as
    unigram_logprob). One shuffle on (doc) closes the aggregation.
    """
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    base = docs.select(F.col(id_col), ws.alias("ws")).filter(
        F.size("ws") >= 1
    )
    n = F.size("ws")
    pairs = F.zip_with(
        F.slice("ws", F.lit(1), n - 1),
        F.slice("ws", F.lit(2), n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = base.select(
        F.col(id_col), F.explode(pairs).alias("bg")
    ).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    toks = base.select(F.col(id_col), F.explode("ws").alias("token"))
    uni = toks.groupBy("token").agg(F.count("*").alias("u"))
    total = toks.agg(F.count("*").alias("n"))
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("bigint").alias("c1"))

    def micros(p):
        return F.floor(F.log(p) * 1000000 + F.lit(0.5)).cast("bigint")

    uni_p = F.col("u").cast("double") / F.col("n")
    first = (
        base.select(
            F.col(id_col), F.element_at("ws", 1).alias("token")
        )
        .join(uni, "token")
        .crossJoin(F.broadcast(total))
        .select(id_col, micros(uni_p).alias("lp"))
    )
    big_p = (
        F.lit(lam) * (F.col("c2").cast("double") / F.col("c1"))
        + F.lit(1.0 - lam) * uni_p
    )
    rest = (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .join(uni.withColumnRenamed("token", "w2"), "w2")
        .crossJoin(F.broadcast(total))
        .select(id_col, micros(big_p).alias("lp"))
    )
    return (
        first.unionByName(rest)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("lp").cast("bigint").alias("logprob_micros"),
        )
        .select(
            id_col,
            "n_tokens",
            "logprob_micros",
            # floor of the SAME double quotient is unambiguous in any
            # engine (no tie semantics) — round() is not: Spark's
            # HALF_UP on the exact binary value and DuckDB's round can
            # disagree by one ulp-digit on boundary quotients (found at
            # sf0.1). Average stays in exact integer micros.
            F.floor(
                F.col("logprob_micros").cast("double") / F.col("n_tokens")
            ).cast("bigint").alias("avg_lp_micros"),
        )
    )


#: Redaction patterns written in the ASCII-only regex subset on which Java
#: regex (Spark) and RE2 (DuckDB) agree — no lookarounds, no \d shorthand.
EMAIL_PATTERN = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
NUMBER_PATTERN = "[0-9]+"


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """PII redaction pass — the scrubbing stage every public-web training
    corpus runs (emails, phone-like digit runs) as pure regexp_replace
    expressions, one projection, zero shuffles.

    The testdata corpus is synthetic word salad with no PII, so the query
    deterministically augments each doc with a contact trailer derived
    from its own columns (source + a doc_id-keyed number) — the operator
    exercises real redaction while staying oracle-checkable. On real data
    drop the augmentation and pass the raw text column.

    Output: (doc_id, n_emails, n_numbers, scrubbed) where n_numbers counts
    digit runs OUTSIDE emails (emails are redacted first).

    Scale shape: narrow per-row projection fused into whole-stage codegen
    with whatever scan/filter surrounds it — the cost is one pass over the
    bytes; nothing is exchanged.
    """
    aug = F.concat(
        F.col(text_col),
        F.expr(
            "repeat(concat(' contact ', source, '@example.com ref ', "
            "cast((doc_id * 7919) % 100000 as string)), "
            "cast(1 + doc_id % 3 as int))"
        ),
    )
    after_email = F.regexp_replace(aug, EMAIL_PATTERN, "<EMAIL>")
    return docs.select(
        id_col,
        F.size(
            F.regexp_extract_all(aug, F.lit(EMAIL_PATTERN), F.lit(0))
        ).cast("bigint").alias("n_emails"),
        F.size(
            F.regexp_extract_all(
                after_email, F.lit(NUMBER_PATTERN), F.lit(0)
            )
        ).cast("bigint").alias("n_numbers"),
        F.regexp_replace(after_email, NUMBER_PATTERN, "<NUM>")
        .alias("scrubbed"),
    )


def normalize_text(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Canonical text normalization — the standard pre-dedup/pre-training
    cleanup pass (lowercase, strip non-alphanumerics to spaces, squeeze
    whitespace runs, trim) plus a content digest:

    Output: (id, norm_text, norm_sha BINARY-as-hex, n_chars_removed).
    The digest (sha2 over the normalized form) is what exact-dedup and
    shard-assignment key on downstream — hashing the canonical form makes
    trivially-reformatted duplicates collide.

    Scale shape: ONE codegen projection over the scan (regexp_replace /
    lower / sha2 builtins), no exchange, no Python — the same
    zero-exchange posture as pii_scrub. Character classes are explicit
    ASCII ([^a-z0-9 ]) so Java and RE2 regex engines agree byte-for-byte
    (the oracle replays the identical pipeline in DuckDB).
    """
    lowered = F.lower(F.col(text_col))
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", " ")
    squeezed = F.regexp_replace(stripped, " +", " ")
    norm = F.trim(squeezed)
    return docs.select(
        id_col,
        norm.alias("norm_text"),
        F.sha2(norm, 256).alias("norm_sha"),
        (F.length(text_col) - F.length(norm))
        .cast("bigint")
        .alias("n_chars_removed"),
    )


def entity_extract(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Entity EXTRACTION — the inverse of pii_scrub: instead of redacting
    emails/URLs in place, emit one row per found entity (id, entity_type,
    entity, pos) for linking, contact-graph building, or quarantine
    review.  regexp_extract_all + a posexplode per entity type, unioned;
    all codegen, zero exchanges (the explode fans out rows inside the
    scan's partition).  Explicit ASCII character classes keep Java and
    RE2 semantics byte-identical, as in normalize_text.
    """
    email_re = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    url_re = r"https?://[a-z0-9./_%-]+"

    def one(kind: str, pattern: str) -> DataFrame:
        return docs.select(
            id_col,
            F.lit(kind).alias("entity_type"),
            F.posexplode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(pattern), 0
                )
            ).alias("pos", "entity"),
        ).select(id_col, "entity_type", F.col("pos").cast("bigint").alias("pos"),
                 "entity")

    return one("email", email_re).unionByName(one("url", url_re))


#: OOV log-prob penalty in integer micros (~ln(1e-9)), a LITERAL so both
#: engines agree bit-for-bit without evaluating a transcendental.
OOV_PENALTY_MICROS = -20_723_266


def crossdomain_lm_score(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's ACTUAL deployment shape for LM scoring (Wenzek et al.
    2020): the unigram model trains on a clean REFERENCE corpus
    (`train`) and scores a different corpus (`score`) — unlike
    unigram_logprob, whose self-trained score conflates 'fluent' with
    'typical of itself'.  Out-of-vocabulary tokens get a fixed integer
    penalty (OOV_PENALTY_MICROS — a literal, so no cross-engine
    transcendental) and are counted per doc: a high OOV rate is itself
    a quality signal.

    Same determinism (integer-micros before summing) and scale shape as
    unigram_logprob: train-side vocab is a plain equi-join probe (AQE
    decides broadcast), the 1-row train total broadcasts, one shuffle
    per corpus explode + the per-doc reduce.
    """
    t_toks = train.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("token")
    )
    vocab = t_toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = t_toks.agg(F.count("*").alias("total"))

    s_toks = score.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("token"),
    )
    seen_lp = F.floor(
        F.log(F.col("cnt").cast("double") / F.col("total")) * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    lp = F.when(F.col("cnt").isNull(), F.lit(OOV_PENALTY_MICROS)).otherwise(
        seen_lp
    )
    return (
        s_toks.join(vocab, "token", "left")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.col("cnt").isNull().cast("bigint")).alias("n_oov"),
            F.sum(lp).cast("bigint").alias("logprob_micros"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            "logprob_micros",
            # floor of the SAME double quotient is unambiguous in any
            # engine (no tie semantics) — round() is not: Spark's
            # HALF_UP on the exact binary value and DuckDB's round can
            # disagree by one ulp-digit on boundary quotients (found at
            # sf0.1). Average stays in exact integer micros.
            F.floor(
                F.col("logprob_micros").cast("double") / F.col("n_tokens")
            ).cast("bigint").alias("avg_lp_micros"),
        )
    )


def hashed_linear_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
) -> DataFrame:
    """FastText-style hashed linear document classifier (Joulin 2016 —
    the model class behind GPT-3's quality filter and FineWeb-Edu's
    educational scorer): token -> hashing-trick bucket -> weight, score
    = sum of weights, keep = score >= 0. The deployment-side half of
    that pipeline — training happens offline; scoring 100 TB is this
    operator's job.

    Weights here are a deterministic integer-LCG function of the bucket
    (a stand-in for trained weights, same decoupling as multimodal's
    deterministic fake decode: the Spark-side plumbing — hashing trick,
    per-row fold, integer scoring — is real and oracle-exact; swapping
    in trained weights is a broadcast join or a literal array lookup).
    Token hash is a rolling fold (acc*31 + c) % FINGERPRINT_MOD over
    the chars of hex(utf8_bytes(token)) — hashing the HEX SPELLING of
    the token's UTF-8 bytes rather than raw chars, because raw-char
    folds diverge across engines on supplementary-plane input (Spark
    iterates UTF-16 code units, so ascii() yields a surrogate where
    DuckDB yields the codepoint); hex chars are pure ASCII, where every
    engine agrees. weight(b) = ((b*2654435761 + 12345) % 2147483647)
    % 7 - 3, in [-3, 3]. Everything stays in one zero-exchange codegen
    projection: nested higher-order functions, no explode, no shuffle —
    the per-row cost profile you want when scoring a crawl.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    tok_hash = hex_fold_hash

    def weight(t):
        b = tok_hash(t) % n_buckets
        return ((b * 2654435761 + 12345) % 2147483647) % 7 - 3

    score = F.aggregate(
        F.transform(toks, weight),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    return docs.select(
        id_col,
        F.size(toks).cast("bigint").alias("n_tokens"),
        score.alias("score_sum"),
        (score >= 0).alias("keep"),
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Robust winnowing (Schleimer 2003, the MOSS fingerprinting
    scheme): hash every char k-gram, slide a w-window over the hash
    sequence, and select each window's RIGHTMOST MINIMAL hash — the
    selection is position-stable under edits (the guarantee that makes
    it the standard local fingerprinter for plagiarism/clone/overlap
    detection at corpus scale, a density-bounded alternative to the
    doc-level fingerprint and the shingle-set MinHash this engine
    already carries).

    Output per doc: n_fps (distinct selected (hash, pos) pairs),
    fp_sum (sum of selected hashes — the order-free checksum an oracle
    can state), pos_sum. Docs shorter than k + w - 1 chars yield no
    full window and are absent, as the scheme defines.

    Engine shape: positions explode DISTRIBUTEDLY (one Generate per
    step, never a collect), the k-gram hash is the shared
    hex_fold_hash codegen fold, each (pos, hash) fans out to exactly w
    window-ends (the t5_sliding playbook), and the rightmost-minimal
    pick is ONE aggregate via min(struct(hash, -pos)) — no join-back,
    no second shuffle. Cost is O(chars * w) rows through two hash
    aggregates; per-doc state never materializes.
    """
    L = F.length(F.col(text_col))
    grams = docs.filter(L >= k + w - 1).select(
        F.col(id_col),
        F.col(text_col),
        (L - k + 1).cast("bigint").alias("ng"),
        F.explode(
            F.sequence(F.lit(1).cast("bigint"), (L - k + 1).cast("bigint"))
        ).alias("pos"),
    )
    hs = grams.select(
        id_col,
        "ng",
        "pos",
        hex_fold_hash(
            F.expr(f"substring({text_col}, pos, {k})")
        ).alias("h"),
    )
    wends = hs.select(
        id_col,
        "h",
        "pos",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + (w - 1))
        ).alias("j"),
    ).filter((F.col("j") <= F.col("ng")) & (F.col("j") >= w))
    picks = (
        wends.groupBy(id_col, "j")
        .agg(F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np")))
             .alias("pick"))
        .select(
            id_col,
            F.col("pick.h").alias("h"),
            (-F.col("pick.np")).alias("pos"),
        )
        .distinct()
    )
    return picks.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_fps"),
        F.sum("h").cast("bigint").alias("fp_sum"),
        F.sum("pos").cast("bigint").alias("pos_sum"),
    )


def _bpe_pair_counts(df: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent symbol-pair counts over a vocabulary
    DataFrame carrying (syms ARRAY<STRING>, cnt) — the shared counting
    step of BPE training (bpe_merge_steps) and encoding (bpe_encode).
    Runs on vocabulary-sized input; the corpus-sized work happened in
    the one map-side-combined token count that built `cnt`."""
    idx = F.when(
        F.size("syms") >= 2, F.sequence(F.lit(0), F.size("syms") - 2)
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.get("syms", i).alias("pa"),
                        F.get("syms", i + 1).alias("pb"),
                    ),
                )
            ).alias("p"),
            "cnt",
        )
        .groupBy("p.pa", "p.pb")
        .agg(F.sum("cnt").cast("bigint").alias("n"))
    )


def _bpe_merge_fold():
    """The greedy left-to-right BPE merge of the broadcast winner
    (mA, mB) into a token's symbol array, as a LEFT-FOLD over `syms`
    inside F.aggregate — pure JVM expression, no Python. The fold needs
    no lookahead or skip flag: element x merges into the accumulator's
    last element L exactly when (L, x) == (mA, mB), and a just-merged
    element can never re-match because mA||mB is strictly longer than
    mA — so `last == mA` is false for fresh merges by construction."""
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.col("mA"))
            & (x == F.col("mB")),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.col("mA"), F.col("mB"))),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_merge_steps(
    docs: DataFrame, n_steps: int = 3, k: int = 5,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """CHAINED BPE merge learning — n_steps true merge iterations, each
    reflected in the next step's pair counts (the loop d4_bpe_pair_counts
    runs one turn of, unrolled exactly as the g1/g3 iterative queries
    unroll theirs so an external SQL oracle can state every step).

    Per step: (1) corpus-weighted adjacent symbol-pair counts over the
    DISTINCT-token vocabulary (the same vocab-not-occurrences scale trick
    as d4_bpe_pair_counts — corpus-sized work is one map-side-combined
    token count, everything after runs on vocabulary-sized input);
    (2) the winning pair — max count, (pa, pb) lexicographic tie-break —
    selected as a ONE-ROW broadcast (TakeOrderedAndProject; no collect,
    no driver loop state); (3) the merge applied to every token as a
    LEFT-FOLD over its symbol array inside F.aggregate — pure JVM
    expression, no Python. The fold needs no lookahead or skip flag:
    greedy left-to-right BPE merges element x into the accumulator's
    last element L exactly when (L, x) == (pa, pb), and a just-merged
    element can never re-match because pa||pb is strictly longer than
    pa — so `last == pa` is false for fresh merges by construction.

    Output: for each step s in 1..n_steps the top-k pairs BEFORE merge s
    (rnk 1 = the pair merged), plus step n_steps+1 = the counts after
    the final merge. The top-k rank window runs on an already-limited
    k-row input, not the vocabulary.
    """
    from citydata_etl_spark.caching import scoped_persist
    from citydata_etl_spark.operators.dedup import tokens
    from pyspark.sql import Window as W

    tc = scoped_persist(
        tokens(docs, text_col, id_col, distinct=False)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    cur = tc.select(F.split("token", "").alias("syms"), "cnt")
    pair_counts = _bpe_pair_counts

    def topk(pairs: DataFrame, step: int) -> DataFrame:
        lim = pairs.orderBy(F.desc("n"), "pa", "pb").limit(k)
        # rank window over the already-limited k rows, not the vocab
        rw = W.orderBy(F.desc("n"), "pa", "pb")
        return lim.select(
            F.lit(step).cast("bigint").alias("step"), "pa", "pb", "n",
            F.row_number().over(rw).cast("bigint").alias("rnk"),
        )

    outs = []
    for step in range(1, n_steps + 1):
        pairs = pair_counts(cur)
        outs.append(topk(pairs, step))
        best = pairs.orderBy(F.desc("n"), "pa", "pb").limit(1).select(
            F.col("pa").alias("mA"), F.col("pb").alias("mB")
        )
        merged = _bpe_merge_fold()
        # persist each step's merged vocabulary: all n_steps+1 output
        # branches share the chain prefix, and the vocab is bounded
        # (distinct tokens), so this trades a tiny cache for not
        # recompiling/recomputing the fold chain once per branch.
        # LEFT join on TRUE, not crossJoin (the bpe_encode guard): an
        # EMPTY winner (no adjacent pair anywhere) must make the merge
        # a no-op, not annihilate the vocabulary.
        cur = scoped_persist(
            cur.join(F.broadcast(best), F.lit(True), "left").select(
                merged.alias("syms"), "cnt"
            )
        )
    outs.append(topk(pair_counts(cur), n_steps + 1))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def bpe_encode(
    docs: DataFrame, n_steps: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer APPLICATION — the other half of BPE that bpe_merge_steps
    trains: learn n_steps merges on the corpus, then ENCODE every
    document with them and report the per-document token budget
    (reference intent: citydata-etl computes per-record derived stats in
    lambda/transform.py; this is that stamp for the LLM-tokenizer case).

    Scale shape — encode the VOCABULARY, not the corpus: training and
    encoding both run on the distinct-token table (bounded, ~10^6 rows
    at 100 TB), and the only corpus-sized operations are the initial
    map-side-combined token count and one final hash join of per-doc
    token occurrences against the encoded vocab (equi-join on token —
    no skew beyond natural token frequency, which the join tolerates
    because the vocab side is the small build side). A per-occurrence
    encode would fold symbol arrays ~10^13 times; this folds each
    distinct token once.

    Merge application reuses the training loop's greedy left-to-right
    fold (_bpe_merge_fold; equivalence to first-occurrence recursive
    replacement argued there), so a token's encoded length is exactly
    what the trained tokenizer produces after n_steps merges.

    Output per document: n_words (whitespace tokens), n_chars (symbols
    before any merge = total token length), n_bpe_tokens (symbols after
    the n_steps merges; n_chars - n_bpe_tokens = merges applied), and
    saved_bp = (n_chars - n_bpe_tokens) * 10000 div n_chars — the
    compression in exact basis points (true INTEGER division, not
    floor-of-double: at 100 TB the numerator exceeds 2^53 and a double
    quotient is no longer exact), and n_decode_errors — the
    encode-then-detokenize conservation count (tokens whose
    concatenated symbols differ from the original; 0 by construction,
    verified independently by the oracle's own chain).
    """
    from citydata_etl_spark.caching import scoped_persist
    from citydata_etl_spark.operators.dedup import tokens

    occ = tokens(docs, text_col, id_col, distinct=False)
    tc = scoped_persist(
        occ.groupBy("token").agg(F.count("*").alias("cnt"))
    )
    cur = tc.select("token", F.split("token", "").alias("syms"), "cnt")
    for _ in range(n_steps):
        best = (
            _bpe_pair_counts(cur)
            .orderBy(F.desc("n"), "pa", "pb")
            .limit(1)
            .select(F.col("pa").alias("mA"), F.col("pb").alias("mB"))
        )
        # LEFT join (not crossJoin): when the corpus has no adjacent
        # pair at all (every token is a single symbol) the winner table
        # is EMPTY, and a crossJoin would annihilate the vocabulary —
        # the merge must be a no-op instead. With mA/mB NULL the fold's
        # merge branch can never fire (NULL comparison -> otherwise),
        # so the fold degrades to the identity append.
        cur = scoped_persist(
            cur.join(F.broadcast(best), F.lit(True), "left").select(
                "token", _bpe_merge_fold().alias("syms"), "cnt"
            )
        )
    # conservation check rides along: detokenizing (concatenating) a
    # token's encoded symbols must reproduce the token EXACTLY — any
    # fold bug that drops, duplicates, or reorders characters flips
    # `bad` to 1 and surfaces as a nonzero per-doc n_decode_errors
    # (the oracle derives its zero through an independent merge chain,
    # so engine-side corruption hash-fails rather than hides)
    enc = cur.select(
        "token",
        F.size("syms").cast("bigint").alias("n_sym"),
        F.when(F.concat_ws("", F.col("syms")) != F.col("token"), 1)
        .otherwise(0).alias("bad"),
    )
    per_doc = (
        occ.join(enc, "token")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(F.length("token")).cast("bigint").alias("n_chars"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
            F.sum("bad").cast("bigint").alias("n_decode_errors"),
        )
    )
    return per_doc.select(
        id_col, "n_words", "n_chars", "n_bpe_tokens",
        F.expr("((n_chars - n_bpe_tokens) * 10000) div n_chars")
        .cast("bigint").alias("saved_bp"),
        "n_decode_errors",
    )


def bm25_topk(
    docs: DataFrame, query_terms: list[str], k: int = 10,
    k1: float = 1.2, b: float = 0.75,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """BM25 retrieval scoring (Robertson/Sparck Jones; the Lucene idf
    form ln(1 + (N - df + 0.5)/(df + 0.5))) — the lexical-retrieval
    baseline every RAG/dedup pipeline keeps next to its embedding
    index. Integer-exact cross-engine by the d4_lm_logprob convention:
    each term's contribution idf * tf*(k1+1) / (tf + k1*(1-b+b*dl*N/T))
    is rounded HALF-UP to integer MICROS before summing (associative,
    bit-exact; every operand derives from exact integer counts, so
    both engines evaluate the identical double expression).

    Output: (rank, doc_id, score_micros, n_hits) for the global top-k
    by score, doc_id as the tie-break. The global order costs one
    TakeOrderedAndProject-shaped sort-limit; the rank window then runs
    over k rows only — never a single-partition window over the corpus.

    Scale shape — TWO corpus scans, nothing else corpus-sized: scan 1
    explodes tokens pre-joined against the BROADCAST query terms, so
    only |Q|-term POSTINGS survive (persisted: postings-sized, tiny);
    scan 2 is the 1-row corpus totals aggregate (sum dl, count docs),
    broadcast via crossJoin. tf, df, and dl all derive from the
    persisted postings (df = docs-with-tf>0 per term — no second
    distinct over the corpus); the global order is a sort-limit
    (TakeOrderedAndProject) and the rank window runs over k rows
    only — never a single-partition window over the corpus."""
    from citydata_etl_spark.caching import scoped_persist

    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = docs.select(F.col(id_col), toks.alias("toks"))
    spark = docs.sparkSession
    # dedupe: a repeated query term would double its postings and
    # silently inflate tf (review r11)
    q = spark.createDataFrame(
        [(t,) for t in dict.fromkeys(query_terms)], "term STRING"
    )
    # scan 1: postings of the query terms only, dl riding along
    hits = scoped_persist(
        base.select(
            id_col,
            F.size("toks").cast("double").alias("dl"),
            F.explode("toks").alias("term"),
        ).join(F.broadcast(q), "term")
    )
    # scan 2: corpus totals (all docs, including zero-hit ones)
    totals = base.agg(
        F.sum(F.size("toks")).cast("double").alias("t_tokens"),
        F.count("*").cast("double").alias("n_docs"),
    )
    tf = hits.groupBy(id_col, "term").agg(
        F.count("*").cast("double").alias("tf"),
        F.max("dl").alias("dl"),
    )
    df_rel = tf.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )
    contrib = (
        tf.join(df_rel, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.floor(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (
                    (F.col("tf") * F.lit(k1 + 1.0))
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            # parenthesized EXACTLY as the oracle and
                            # the Python model state it — b*((dl*N)/T);
                            # ((b*dl)*N)/T differs by one ulp on ~20%
                            # of integer inputs (review r11)
                            + F.lit(b)
                            * (
                                F.col("dl") * F.col("n_docs")
                                / F.col("t_tokens")
                            )
                        )
                    )
                )
                * 1000000
                + 0.5
            ).cast("bigint").alias("c"),
        )
    )
    scored = contrib.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("score_micros"),
        F.count("*").cast("bigint").alias("n_hits"),
    )
    top = scored.orderBy(
        F.col("score_micros").desc(), F.col(id_col)
    ).limit(k)
    from pyspark.sql import Window as W

    rnk = F.row_number().over(
        W.orderBy(F.col("score_micros").desc(), F.col(id_col))
    )
    return top.select(
        rnk.cast("bigint").alias("rank"), id_col,
        "score_micros", "n_hits",
    )
