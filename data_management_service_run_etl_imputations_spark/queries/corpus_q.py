"""Corpus-preparation queries — the LLM training-data pipeline steps a
100 TB corpus needs between "raw documents" and "training shards":
deterministic splits, stratum balancing, sequence packing, quality
filtering, sessionization. All oracle-checked (the operators are built on
SQL-portable deterministic arithmetic — see operators/corpus.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.corpus import (
    balanced_sample,
    chunk_documents,
    contamination,
    pack_sequences,
    quality_flags,
    repetition_flags,
    sessionize,
    shuffle_shards,
    source_mixture_sample,
    train_val_test_split,
)
from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table

# (id * knuth) % 2^32 on 16-bit split operands — overflow-safe mirror of
# operators/corpus.py:scramble (naive id*K overflows int64 for id >= ~3.47e9).
_SCRAMBLE_SQL = (
    "((doc_id & 65535) * 2654435761"
    " + (((doc_id >> 16) & 65535) * 2654435761 % 4294967296) * 65536)"
    " % 4294967296"
)


@register(
    "corpus_train_val_test_split",
    oracle=f"""
        SELECT split, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM (
            SELECT n_chars,
                   CASE WHEN {_SCRAMBLE_SQL} % 100 < 80 THEN 'train'
                        WHEN {_SCRAMBLE_SQL} % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        ) GROUP BY split
    """,
)
def corpus_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split by Knuth-hashed doc id, summarized per
    split. A pure narrow map + one aggregate — reproducible across reruns
    and engines (``rand()`` splits resample when a lost partition is
    recomputed; hashed-id splits cannot)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        train_val_test_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "corpus_balanced_sample",
    oracle=f"""
        WITH sizes AS (
            SELECT source, COUNT(*) AS n FROM documents GROUP BY source
        ),
        ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY {_SCRAMBLE_SQL}, doc_id) AS rk
            FROM documents
        )
        SELECT r.doc_id, r.source
        FROM ranked r
        WHERE r.rk <= (SELECT MIN(n) FROM sizes)
    """,
)
def corpus_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-balanced downsampling: every ``source`` stratum keeps exactly
    min-stratum-size docs, chosen by scrambled-id order — skewed corpus →
    balanced mix without replacement sampling. Window rank per stratum +
    broadcast of the per-stratum minimum."""
    docs = load_table(spark, sf_dir, "documents")
    return balanced_sample(docs, "source", "doc_id").select("doc_id", "source")


@register(
    "corpus_pack_sequences",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, source,
                   len(list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '')) AS n_tokens
            FROM documents
        ),
        binned AS (
            SELECT source, n_tokens,
                   CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / 2048.0) AS BIGINT) AS bin_id
            FROM toks
        )
        SELECT source, bin_id, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM binned GROUP BY source, bin_id
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing of docs into 2048-token bins per source
    shard — the data loader's "pack shard into fixed context windows"
    step as one window cumsum (per-shard windows: no global order, no
    single-partition funnel at any scale)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    )
    return pack_sequences(
        docs.withColumn("__nt", n_tokens),
        "doc_id",
        "__nt",
        budget=2048,
        partition_col="source",
    )


@register(
    "corpus_quality_filter",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, text,
                   list_filter(string_split_regex(text, '\s+'),
                               x -> x <> '') AS t
            FROM documents
        ),
        stats AS (
            SELECT doc_id,
                   len(t) AS n_words,
                   CAST(list_aggregate(list_transform(t, x -> length(x)),
                                       'sum') AS DOUBLE)
                       / NULLIF(len(t), 0) AS ml,
                   regexp_matches(text, '[.!?]\s*$') AS ends_terminal
            FROM toks
        )
        SELECT doc_id, n_words, ROUND(ml, 6) AS mean_word_len, ends_terminal,
               (n_words >= 5 AND ml >= 3 AND ml <= 10 AND ends_terminal)
                   AS keep
        FROM stats
    """,
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style heuristic quality flags (word count, mean word length,
    terminal punctuation) + combined keep decision, per document — pure
    column expressions, flags kept separate so a mixture can re-weight
    instead of hard-dropping."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_flags(docs, "text").select(
        "doc_id", "n_words", "mean_word_len", "ends_terminal", "keep"
    )


@register(
    "events_sessionize",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch(ts - LAG(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                        AS BIGINT) AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM sessions GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity starts a new session):
    LAG + running SUM over one per-user window (both reuse one shuffle),
    then a per-session aggregate — the batch twin of the streaming session
    window query."""
    events = load_table(spark, sf_dir, "events")
    return sessionize(
        events, "user_id", "ts", "event_id", gap_seconds=1800
    )


@register(
    "corpus_decontaminate",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'),
                               x -> x <> '') AS t
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS shingle
            FROM toks,
                 LATERAL (SELECT unnest(generate_series(1,
                              greatest(len(t) - 7, 1))) AS i) g
        ),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 7),
        tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 <> 7)
        SELECT tr.doc_id AS id,
               CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
        FROM tr JOIN ev USING (shingle)
        GROUP BY tr.doc_id
    """,
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag training documents sharing any
    8-word shingle with the held-out eval slice (doc_id % 10 = 7 stands in
    for a benchmark set). Spark joins on 61-bit shingle HASHES with the
    eval set broadcast (the 100 TB-side scan never shuffles); the oracle
    recomputes the overlap on raw shingle STRINGS — hash-collision-free
    w.h.p., so the outputs must agree exactly."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 10 == 7
    return contamination(
        docs.filter(~is_eval), docs.filter(is_eval), "doc_id", "text", k=8
    )


@register(
    "corpus_repetition_filter",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'),
                               x -> x <> '') AS t
            FROM documents
        ),
        ng AS (
            SELECT doc_id,
                   list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                                  i -> array_to_string(t[i:i+2], ' ')) AS g
            FROM toks
        )
        SELECT doc_id,
               CAST(len(g) AS BIGINT) AS n_ngrams,
               ROUND(CAST(len(g) - len(list_distinct(g)) AS DOUBLE)
                     / len(g), 6) AS dup_frac,
               (CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / len(g))
                   <= 0.2 AS keep
        FROM ng
    """,
)
def corpus_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: duplicate word-trigram fraction per
    document, keep ≤ 0.2 (Rae et al. 2021 §A1.1). Entirely codegen column
    expressions — no shuffle, no UDF, no join."""
    docs = load_table(spark, sf_dir, "documents")
    return repetition_flags(docs, "text", n=3, max_dup_frac=0.2).select(
        "doc_id", "n_ngrams", "dup_frac", "keep"
    )


@register(
    "corpus_source_mixture",
    oracle=f"""
        WITH stats AS (
            SELECT source, SUM(n_chars) AS t FROM documents GROUP BY source
        ),
        rates AS (
            SELECT source, (SELECT MIN(t) FROM stats) * 10000 // t AS thr
            FROM stats
        ),
        kept AS (
            SELECT d.source, d.n_chars
            FROM documents d JOIN rates r USING (source)
            WHERE ({_SCRAMBLE_SQL}) % 10000 < r.thr
        )
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM kept GROUP BY source
    """,
)
def corpus_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-balanced data mixing: downsample every source to the
    smallest source's char total with a deterministic integer-threshold
    keep rule on the scrambled doc id (no rand(), no float boundary —
    engines agree row-for-row). Rate table broadcasts; the corpus never
    shuffles for the sampling itself."""
    docs = load_table(spark, sf_dir, "documents")
    kept = source_mixture_sample(docs, "source", "doc_id", "n_chars")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "corpus_chunk_documents",
    oracle=r"""
        WITH t AS (
            -- COALESCE mirrors the Spark side: a NULL text chunks like
            -- an empty document (one 0-token chunk) instead of relying
            -- on engine-specific NULL semantics in greatest/least
            SELECT doc_id,
                   list_filter(regexp_split_to_array(COALESCE(text, ''),
                                                     '\s+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        s AS (
            -- last start = 1 + ceil((n-16)/12)*12: the final window always
            -- reaches the last token (tail is never dropped)
            SELECT doc_id, toks, len(toks) AS n,
                   unnest(generate_series(
                       1,
                       1 + 12 * greatest((len(toks) - 16 + 11) // 12, 0),
                       12)) AS chunk_start
            FROM t
        )
        SELECT doc_id,
               (chunk_start - 1) // 12 AS chunk_id,
               CAST(chunk_start AS INT) AS chunk_start,
               CAST(greatest(least(16, n - chunk_start + 1), 0) AS INT)
                   AS n_chunk_tokens,
               array_to_string(
                   list_slice(toks, chunk_start, chunk_start + 15), ' ')
                   AS chunk_text
        FROM s
    """,
)
def corpus_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (RAG / embedding-index prep): 16-token
    windows, 12-token hop (4 overlap), one row per chunk with its text.
    Narrow map + posexplode — no shuffle; composes with an embedding
    Pandas UDF downstream."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", chunk_tokens=16, stride=12)


@register(
    "corpus_shuffle_shards",
    oracle=f"""
        SELECT doc_id, shard,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id)
                   AS seq
        FROM (
            -- shard from the HIGH bits (range partition of the hash
            -- space): low bits of a Knuth multiplicative hash are weak
            -- (K = 1 mod 16), so `% 8` would be round-robin on doc_id
            SELECT doc_id,
                   CAST((({_SCRAMBLE_SQL}) * 8) // 4294967296 AS INT)
                       AS shard,
                   {_SCRAMBLE_SQL} AS k
            FROM documents
        )
    """,
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding (training-order writer
    prep): (shard, seq) define a reproducible pseudo-random total order
    with no global sort — only a hash shuffle on the shard key, each
    shard ranking independently."""
    docs = load_table(spark, sf_dir, "documents")
    return shuffle_shards(docs, "doc_id", n_shards=8)
