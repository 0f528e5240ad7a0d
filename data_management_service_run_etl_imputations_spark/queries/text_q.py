"""Text-analysis queries over the documents table (engine extension:
lang-id, quality scoring, token counting, fingerprinting)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.text import (
    fingerprint_col,
    with_lang_id,
    with_quality_score,
    with_token_counts,
)
from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table

# Shared SQL fragments so every text oracle tokenizes identically to
# operators/text.py (whitespace split, empties dropped).
_TOKS = r"list_filter(string_split_regex({col}, '\s+'), x -> x <> '')"
_LOWER_TOKS = _TOKS.format(col="lower(text)")
_SCORE = (
    "len(list_filter(" + _LOWER_TOKS + ", x -> x IN ({markers})))"
)


def _markers_sql(lang: str) -> str:
    from data_management_service_run_etl_imputations_spark.operators.text import (
        LANG_MARKERS,
    )

    return ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])


@register(
    "text_token_counts",
    oracle=rf"""
        SELECT doc_id,
               CAST(len({_TOKS.format(col="text")}) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]')) AS BIGINT)
                   AS n_bpe_pieces
        FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces (LLM token
    budget proxies)."""
    docs = load_table(spark, sf_dir, "documents")
    return with_token_counts(docs).select("doc_id", "n_ws_tokens", "n_bpe_pieces")


@register(
    "text_lang_id",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id,
                   {_SCORE.format(markers=_markers_sql("en"))} AS s_en,
                   {_SCORE.format(markers=_markers_sql("es"))} AS s_es,
                   {_SCORE.format(markers=_markers_sql("de"))} AS s_de,
                   {_SCORE.format(markers=_markers_sql("fr"))} AS s_fr
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'und'
                    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                    WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                    WHEN s_de >= s_fr THEN 'de'
                    ELSE 'fr' END AS lang_detected
        FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (n-gram heuristic shape: per-token set
    membership counts → priority argmax)."""
    docs = load_table(spark, sf_dir, "documents")
    return with_lang_id(docs).select("doc_id", "lang_detected")


@register(
    "text_quality_score",
    headline=True,
    oracle=rf"""
        WITH t AS (
            SELECT doc_id, text,
                   CAST(len({_TOKS.format(col="text")}) AS BIGINT) AS n_toks,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\r]')) AS n_punct,
                   len(list_filter({_LOWER_TOKS},
                       x -> x IN ({_markers_sql("en")}, {_markers_sql("es")},
                                  {_markers_sql("de")}, {_markers_sql("fr")})))
                       AS n_stop
            FROM documents
        ), r AS (
            SELECT doc_id, n_toks,
                   CASE WHEN n_toks > 0
                        THEN CAST(n_chars AS DOUBLE) / n_toks ELSE 0.0 END AS mtl,
                   CASE WHEN n_chars > 0
                        THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS pr,
                   CASE WHEN n_toks > 0
                        THEN CAST(n_stop AS DOUBLE) / n_toks ELSE 0.0 END AS sr
            FROM t
        )
        SELECT doc_id, n_toks AS n_tokens,
               ROUND(mtl, 6) AS mean_token_len,
               ROUND(pr, 6) AS punct_ratio,
               ROUND(sr, 6) AS stopword_ratio,
               ROUND(CASE WHEN n_toks BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END
                     + LEAST(sr * 2.0, 0.3)
                     + CASE WHEN mtl BETWEEN 3.0 AND 12.0 THEN 0.2 ELSE 0.0 END
                     + CASE WHEN pr <= 0.2 THEN 0.1 ELSE 0.0 END, 6)
                   AS quality_score
        FROM r
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (C4/Gopher-style length, punctuation and
    stopword signals → [0,1] composite)."""
    docs = load_table(spark, sf_dir, "documents")
    return with_quality_score(docs).select(
        "doc_id", "n_tokens", "mean_token_len", "punct_ratio",
        "stopword_ratio", "quality_score",
    )


@register(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, length(text)),
                           i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
        FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint (polynomial rolling hash over
    the character sequence, mod 1e9+7)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_col("text").alias("fingerprint"))


@register(
    "text_tfidf_top_terms",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id, unnest({_LOWER_TOKS}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM toks GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf,
                   ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)
                                DESC, tf.term
                   ) AS rn
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, ROUND(tfidf, 6) AS tfidf
        FROM scored WHERE rn <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-3 terms per document (ties broken by term). Plan shape:
    explode tokens → per-(doc,term) counts → per-term document frequency →
    idf broadcast back onto tf → per-doc top-k window. The df table is
    vocabulary-sized (≪ corpus), so the idf join broadcasts; n_docs rides
    along as a literal-free single-row broadcast, never a collected value."""
    from data_management_service_run_etl_imputations_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    tfidf = F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", tfidf)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"))
    )


# PII patterns chosen for identical semantics in Java regex (Spark) and
# RE2 (DuckDB): explicit classes, no backrefs/lookaround.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"


@register(
    "text_pii_scrub",
    oracle=rf"""
        WITH aug AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 7 = 0
                           THEN ' contact user' || doc_id || '@example.com'
                           ELSE '' END
                   || CASE WHEN doc_id % 11 = 0
                           THEN ' ssn 123-45-6789' ELSE '' END AS t
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{_EMAIL_RE}'))
                    + len(regexp_extract_all(t, '{_SSN_RE}'))
                    AS BIGINT) AS n_pii,
               regexp_replace(
                   regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_SSN_RE}', '<SSN>', 'g') AS scrubbed
        FROM aug
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (emails, SSN-shaped ids) as JVM-side regexes —
    the pre-training scrub step of a corpus pipeline. The synthetic corpus
    carries no PII, so deterministic markers are planted per doc_id and
    must come back both COUNTED and REDACTED; patterns are restricted to
    the Java-regex ∩ RE2 common subset so the oracle replays them
    verbatim. Pure column expressions — no shuffle, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" ssn 123-45-6789")).otherwise(
            F.lit("")
        ),
    )
    t = docs.select("doc_id", aug.alias("t"))
    n_pii = (
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), 0))
        + F.size(F.regexp_extract_all("t", F.lit(_SSN_RE), 0))
    ).cast("long")
    scrubbed = F.regexp_replace(
        F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"), _SSN_RE, "<SSN>"
    )
    return t.select(
        "doc_id", n_pii.alias("n_pii"), scrubbed.alias("scrubbed")
    )
