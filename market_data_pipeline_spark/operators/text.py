"""Text analysis over the ``documents`` table: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

North-star operators (BASELINE.json): what a 100 TB LLM training-data
pipeline runs over every document. All pure ``pyspark.sql.functions``
expressions — whole-stage-codegen'd, no Python in the loop, scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small English stopword set for ratio features — fixed so results are
# deterministic and oracle-expressible.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")


def normalized(text: Column) -> Column:
    """Canonical text normalization: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    """Whitespace tokenization of the normalized text."""
    return F.split(normalized(text), " ")


def add_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword estimate
    (≈ chars/4 like byte-pair vocabularies average for English)."""
    t = tokens(F.col(text_col))
    return (
        df.withColumn("n_tokens", F.size(t))
        .withColumn("n_chars_norm", F.length(normalized(F.col(text_col))))
        .withColumn("bpe_token_est", F.ceil(F.length(F.col(text_col)) / 4.0).cast("long"))
        .withColumn(
            "avg_token_len",
            F.round(
                (F.length(normalized(F.col(text_col))) - F.size(t) + 1)
                / F.size(t).cast("double"),
                4,
            ),
        )
    )


def add_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, punctuation ratio, stopword ratio — the
    cheap heuristics LLM pipelines filter on before expensive model scoring.

    stopword_ratio counts occurrences of a fixed stopword list among tokens;
    score = weighted combination clipped to [0, 1].
    """
    norm = normalized(F.col(text_col))
    n_tok = F.size(tokens(F.col(text_col)))
    punct = F.length(F.regexp_replace(norm, r"[^.,;:!?]", ""))
    stop_hits = sum(
        (
            (F.length(norm) - F.length(F.regexp_replace(norm, f"\\b{w}\\b", "")))
            / len(w)
        ).cast("long")
        for w in STOPWORDS
    )
    df = (
        df.withColumn("punct_ratio", F.round(punct / F.greatest(F.length(norm), F.lit(1)).cast("double"), 6))
        .withColumn("stopword_hits", stop_hits)
        .withColumn(
            "stopword_ratio",
            F.round(stop_hits / F.greatest(n_tok, F.lit(1)).cast("double"), 6),
        )
        .withColumn("len_score", F.least(F.length(norm) / 500.0, F.lit(1.0)))
    )
    quality = (
        0.5 * F.col("len_score")
        + 0.5 * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
    )
    return df.withColumn("quality_score", F.round(quality, 6))


def add_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: score by stopword evidence of English vs a
    'other' fallback — a deterministic n-gram-style heuristic (real pipelines
    plug fastText here; the *plumbing* — a per-row pure expression — is what
    scales)."""
    norm = normalized(F.col(text_col))
    the_hits = (F.length(norm) - F.length(F.regexp_replace(norm, r"\bthe\b", ""))) / 3
    and_hits = (F.length(norm) - F.length(F.regexp_replace(norm, r"\band\b", ""))) / 3
    n_tok = F.greatest(F.size(tokens(F.col(text_col))), F.lit(1))
    evidence = (the_hits + and_hits) / n_tok.cast("double")
    return df.withColumn("lang_pred", F.when(evidence > 0.02, "en").otherwise("other")).withColumn(
        "lang_evidence", F.round(evidence, 6)
    )


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: md5 of the normalized text (exact-dup key)
    plus a 16-hex-char prefix as the short fingerprint. Deterministic across
    engines; the shuffle key for exact dedup."""
    norm = normalized(F.col(text_col))
    return df.withColumn("fingerprint", F.md5(norm)).withColumn(
        "fingerprint16", F.substring(F.md5(norm), 1, 16)
    )


def top_ngrams(df: DataFrame, n: int = 2, k: int = 20, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary statistics: the k most frequent word n-grams
    (counting every occurrence, not per-doc distinct — this is frequency
    analysis, not dedup shingling). Deterministic tiebreak: count desc,
    then ngram asc.

    Scale shape: explode is per-row narrow; the single shuffle is the
    groupBy on the n-gram string, map-side combined. The final top-k is a
    sort of the (bounded) distinct-ngram aggregate, not the corpus.
    """
    toks = tokens(F.col(text_col))
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram"))
        .limit(k)
    )


def tfidf_top_terms(df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """TF-IDF with smoothed IDF (ln((N+1)/(df+1))+1), top-k terms per doc.

    Shuffle shape at scale: explode → groupBy(doc, term) with map-side
    combine (shuffle bytes = distinct terms per doc, not token count) →
    term-keyed doc-frequency agg (vocabulary-sized) → tf⋈idf join on term
    (AQE broadcasts the vocab side when it fits) → per-doc top-k via
    WindowGroupLimit. No driver participation; N enters as a broadcast
    1-row aggregate.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    idf = doc_freq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (F.log((F.col("__n") + 1) / (F.col("df") + 1)) + 1).alias("idf"),
    )
    scored = tf.join(idf, "term").select(
        F.col(id_col),
        "term",
        F.col("tf"),
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "tfidf", "rk")
    )
