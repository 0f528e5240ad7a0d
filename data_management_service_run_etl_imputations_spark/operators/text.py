"""Text-analysis operators for large-scale training-data pipelines
(engine extension beyond the reference surface; BASELINE.json north_star).

All hot-path logic is built-in column expressions (split / filter /
aggregate / regexp) — fully codegen'd, no Python per row. Each operator is a
pure ``DataFrame -> DataFrame`` that appends typed columns, so they compose
into cleaning pipelines: tokenize → lang_id → quality → filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword lang-id heuristic.
# Deliberately tiny + deterministic (the point is the distributed shape:
# per-token set membership + argmax, not lexical coverage — swap in real
# frequency tables for production).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "et", "des", "une"),
}

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol —
# the GPT-2-style split shape, ASCII-safe so Java and RE2 regex agree.
BPE_ISH_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization with empty-token removal (split on ''
    boundaries yields empties both in Spark and ANSI engines)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, TOKEN_SPLIT_RE), lambda x: x != "")


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces — the cheap
    proxies for LLM token budgeting at corpus scale."""
    return df.withColumn(
        "n_ws_tokens", F.size(tokens_col(text_col)).cast("long")
    ).withColumn(
        "n_bpe_pieces",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0)).cast("long"),
    )


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_detected") -> DataFrame:
    """Stopword-marker language ID: per-language token hit counts → argmax
    with fixed priority tie-break (en > es > de > fr), 'und' when no marker
    hits at all."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), lambda x: x != ""
    )
    def _hits(markers: tuple[str, ...]) -> Column:
        # NB: the lambda must take exactly one parameter — Spark binds a
        # Column to every declared parameter (default-arg tricks break).
        return F.size(F.filter(toks, lambda x: x.isin(*markers)))

    scores = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    # Argmax as a chained CASE (portable to the SQL oracle verbatim);
    # earlier languages win ties by construction.
    s_en, s_es, s_de, s_fr = (scores[lang] for lang in ("en", "es", "de", "fr"))
    detected = (
        F.when((s_en == 0) & (s_es == 0) & (s_de == 0) & (s_fr == 0), F.lit("und"))
        .when((s_en >= s_es) & (s_en >= s_de) & (s_en >= s_fr), F.lit("en"))
        .when((s_es >= s_de) & (s_es >= s_fr), F.lit("es"))
        .when(s_de >= s_fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return df.withColumn(out_col, detected)


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, mean token length, punctuation
    ratio, stopword ratio → [0,1] composite. The standard pre-training
    corpus filter shape (cf. C4/Gopher rules), kept deterministic."""
    toks = tokens_col(text_col)
    n_toks = F.size(toks)
    n_chars = F.length(text_col)
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[^A-Za-z0-9 \t\n\r]"), 0)
    )
    all_stop = tuple({t for ms in LANG_MARKERS.values() for t in ms})
    n_stop = F.size(F.filter(toks, lambda x: F.lower(x).isin(*all_stop)))

    mean_tok_len = F.when(n_toks > 0, n_chars.cast("double") / n_toks).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_toks > 0, n_stop.cast("double") / n_toks).otherwise(0.0)
    length_ok = (n_toks >= 10) & (n_toks <= 100000)
    # Composite: reward stopword presence & sane token length, punish symbols.
    score = (
        F.when(length_ok, 0.4).otherwise(0.0)
        + F.least(stop_ratio * 2.0, F.lit(0.3))
        + F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 12.0), 0.2).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.1).otherwise(0.0)
    )
    return (
        df.withColumn("n_tokens", n_toks.cast("long"))
        .withColumn("mean_token_len", F.round(mean_tok_len, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def fingerprint_col(text: Column | str) -> Column:
    """Polynomial rolling hash over the byte/char sequence
    (``acc = (acc*31 + ascii(ch)) mod 1e9+7``) — an order-sensitive document
    fingerprint, portable to any ANSI engine with higher-order list funcs."""
    c = F.col(text) if isinstance(text, str) else text
    # split('') can emit boundary empties — drop them so the char sequence
    # is exactly the string's characters (ascii('') would yield 0s).
    chars = F.filter(F.split(c, ""), lambda ch: ch != "")
    codes = F.transform(chars, lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FINGERPRINT_BASE + x) % FINGERPRINT_MOD,
    )
