"""Corpus-preparation operators for LLM training-data pipelines — engine
extension beyond the reference surface (the dedup/ANN/text families'
sibling): deterministic splits, balanced sampling, sequence packing,
quality filtering, and event sessionization.

Design rules shared by every operator here:
- **Deterministic and SQL-portable.** Randomness comes from a Knuth
  multiplicative hash of the row id (public-domain constant 2654435761),
  not ``rand()`` — the same arithmetic runs in any SQL engine, so every
  operator is oracle-checkable and reruns are stable (a training-data
  pipeline must be reproducible to be debuggable).
- **No global ordering.** Anything needing "random order" sorts by the
  scrambled id WITHIN its partition/stratum window; nothing funnels the
  corpus through a single-partition window.
- **Pure column expressions.** No Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative hashing constant (TAOCP vol. 3 §6.4) — public.
KNUTH_HASH = 2654435761
_M32 = 1 << 32


def scramble(id_col) -> F.Column:
    """Deterministic pseudo-random 32-bit key from a non-negative integer
    id column: ``(id * 2654435761) mod 2^32``, computed on 16-bit split
    operands so no intermediate exceeds ~2^49 — a naive ``id * K`` product
    overflows int64 for ids ≥ ~3.47e9, which raises ARITHMETIC_OVERFLOW
    under Spark 4's default ANSI mode at billions-of-docs scale. Only the
    low 32 bits of the id participate (higher bits are ≡ 0 mod 2^32).

    SQL mirror (same arithmetic, bitwise split):
    ``((id & 65535) * 2654435761
       + (((id >> 16) & 65535) * 2654435761 % 4294967296) * 65536)
      % 4294967296``
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    lo = c.bitwiseAND(F.lit(65535))
    mid = F.shiftright(c, 16).bitwiseAND(F.lit(65535))
    return (
        lo * F.lit(KNUTH_HASH)
        + (mid * F.lit(KNUTH_HASH)) % F.lit(_M32) * F.lit(65536)
    ) % F.lit(_M32)


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by hashed-id bucket — the
    standard reproducible split for training corpora. A pure narrow map:
    no shuffle, no state, stable across reruns and engines (unlike
    ``rand()``-based splits, which resample on every recomputation of a
    lost partition — a classic training-data leak).
    """
    bucket = scramble(id_col) % 100
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def balanced_sample(
    df: DataFrame, stratum_col: str, id_col: str
) -> DataFrame:
    """Group-balanced downsampling: every stratum keeps exactly
    ``min(|stratum|)`` rows — the first ones in scrambled-id order — so a
    skewed corpus becomes label-balanced without replacement sampling.

    Plan shape: one window rank per stratum (shuffle on the stratum key),
    one tiny per-stratum size aggregate whose global min is computed with
    an unpartitioned window over |strata| rows (not over the data), then a
    broadcast join of that min back on. Nothing all-pairs, nothing
    single-partition over row-scale data.
    """
    w = Window.partitionBy(stratum_col).orderBy(scramble(id_col), id_col)
    ranked = df.withColumn("__rk", F.row_number().over(w))
    sizes = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    min_n = sizes.select(
        stratum_col,
        F.min("__n").over(Window.orderBy(F.lit(1))).alias("__min_n"),
    )
    return (
        ranked.join(F.broadcast(min_n), stratum_col)
        .filter(F.col("__rk") <= F.col("__min_n"))
        .drop("__rk", "__min_n")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col,
    budget: int,
    partition_col: str,
) -> DataFrame:
    """Greedy sequential packing of documents into fixed token-budget bins
    (context windows): within each partition, docs are taken in id order
    and a doc starts at offset ``cumsum_before``; its bin is
    ``floor(cumsum_before / budget)``. The pre-training data loader's
    "pack shard into 8k-token sequences" step as one window expression.

    Packing is per-``partition_col`` (source shard / date / worker) — the
    real pipelines pack per shard too, precisely so no global order or
    single-partition cumsum exists at 100 TB.
    Returns one row per (partition, bin): n_docs, total_tokens.
    """
    nt = (
        F.col(n_tokens_col) if isinstance(n_tokens_col, str) else n_tokens_col
    )
    w = Window.partitionBy(partition_col).orderBy(id_col)
    before = F.coalesce(
        F.sum(nt).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    binned = df.select(
        F.col(partition_col),
        nt.alias("__nt"),
        F.floor(before / F.lit(budget)).alias("bin_id"),
    )
    return binned.groupBy(partition_col, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").alias("total_tokens"),
    )


def quality_flags(df: DataFrame, text_col: str) -> DataFrame:
    """C4-style heuristic quality filters as pure column expressions:
    word count, mean word length, terminal punctuation — and the combined
    keep decision (C4's thresholds: ≥5 words, mean word length in [3,10],
    terminal punctuation; Raffel et al. 2020, public). Each flag is
    returned so downstream mixes can re-weight instead of hard-dropping.
    """
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    n_words = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # Empty/whitespace-only docs have n_words = 0: guard the division
    # (DIVIDE_BY_ZERO under ANSI mode) — mean_word_len is NULL and the
    # keep conjunction still evaluates false (n_words >= 5 is false).
    mean_len = F.when(n_words > 0, total_len / n_words)
    ends_terminal = F.col(text_col).rlike(r"[.!?]\s*$")
    return df.select(
        df["*"],
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        ends_terminal.alias("ends_terminal"),
        (
            (n_words >= 5)
            & (mean_len >= 3)
            & (mean_len <= 10)
            & ends_terminal
        ).alias("keep"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Token-window chunking: split every document into overlapping
    fixed-size token windows (the RAG/embedding-index prep step — window
    ``chunk_tokens``, hop ``stride``; overlap = chunk_tokens - stride).

    One row per (doc, chunk): chunk_id, start token offset (1-based),
    token count, and the chunk text. Whitespace tokenization to match the
    engine's other text operators.

    Scale shape: a narrow map + ``posexplode`` — rows expand by
    ~n_tokens/stride but NOTHING shuffles; chunking is embarrassingly
    parallel and composes with a downstream embedding Pandas UDF. Empty
    AND NULL documents yield one empty chunk (start 1, 0 tokens) so the
    doc stays addressable downstream — NULL text is coalesced to ''
    before splitting; without it ``size(split(NULL))`` is NULL, the
    start sequence is NULL, and the document silently vanishes (while
    engines with NULL-ignoring greatest/least, e.g. DuckDB, keep it —
    an oracle divergence waiting for the first NULL row).
    """
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != F.lit(""),
    )
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    )
    # Last start = 1 + ceil((n - chunk)/stride)*stride, so the final window
    # always reaches the last token (a stop bound of n-chunk+1 can fall
    # between stride steps and silently drop the document tail). floor()+
    # clamp matches DuckDB `//` semantics on the negative (short-doc) side.
    n_hops = F.greatest(
        F.floor(
            (F.col("__n") - chunk_tokens + (stride - 1)) / F.lit(stride)
        ),
        F.lit(0),
    )
    starts = F.sequence(
        F.lit(1),
        (F.lit(1) + n_hops * stride).cast("int"),
        F.lit(stride),
    )
    ex = base.select(
        F.col(id_col),
        "__toks",
        "__n",
        F.posexplode(starts).alias("__pos", "chunk_start"),
    )
    return ex.select(
        F.col(id_col),
        F.col("__pos").cast("long").alias("chunk_id"),
        F.col("chunk_start"),
        F.greatest(
            F.least(F.lit(chunk_tokens), F.col("__n") - F.col("chunk_start") + 1),
            F.lit(0),
        ).alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("chunk_start"), chunk_tokens), " "
        ).alias("chunk_text"),
    )


def shuffle_shards(
    df: DataFrame, id_col: str, n_shards: int = 8
) -> DataFrame:
    """Deterministic global shuffle + sharding (the "write the corpus in
    random order across N shard files" step before training): shard =
    scrambled-id mod n_shards, sequence = rank of the scrambled id within
    the shard. Together (shard, seq) define a reproducible pseudo-random
    total order — without a global sort: the only wide operation is the
    shuffle on the shard key, and each shard orders independently.

    At 100 TB, pick n_shards ≫ executor count (shards are output files,
    not partitions) so no shard window exceeds a task's memory; the
    per-shard window is a sort within one hash partition, which Spark
    spills if needed.

    The shard is derived from the HIGH bits of the scrambled id —
    ``(scramble * n_shards) >> 32``, i.e. range partitioning of the
    32-bit hash space — never ``scramble % n_shards``: the Knuth
    constant is ≡ 1 (mod 2^4), so for power-of-two n_shards ≤ 16 the
    low bits of ``id * K`` are the low bits of ``id`` itself and
    "mod n" silently degrades to round-robin on the raw id (the
    classic weak-low-bits failure of multiplicative hashing).
    SQL mirror: ``(scramble * n_shards) // 4294967296``.
    """
    keyed = df.select(
        F.col(id_col),
        F.shiftright(scramble(id_col) * F.lit(n_shards), 32)
        .cast("int")
        .alias("shard"),
        scramble(id_col).alias("__k"),
    )
    w = Window.partitionBy("shard").orderBy("__k", id_col)
    return keyed.select(
        F.col(id_col),
        "shard",
        F.row_number().over(w).cast("long").alias("seq"),
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds ``gap_seconds``. The batch twin of
    the streaming session window (streaming/events.py) — one LAG + one
    running SUM over the same per-user window (the second reuses the
    first's shuffle partitioning).

    Returns one row per session: user, session_seq (1-based per user),
    n_events, session start/end.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (
            F.col(ts_col).cast("double") - prev_ts.cast("double")
            > gap_seconds
        ),
        1,
    ).otherwise(0)
    flagged = events.withColumn("__new", is_new)
    with_session = flagged.withColumn(
        "session_seq", F.sum("__new").over(w)
    )
    return with_session.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Train/eval decontamination: for every training document, count the
    distinct k-token shingles it shares with ANY eval/benchmark document
    (the n-gram-overlap contamination test used for LLM training corpora;
    Brown et al. 2020 §C use 13-grams — ``k`` is the knob).

    Plan: hashed shingles on both sides (``shingle_hashes`` — codegen
    lead()-combine, no interpreted higher-order functions), distinct eval
    shingle set, equi-join on the 61-bit shingle hash, count per train doc.
    The eval side is benchmark-sized (≪ corpus), so it broadcasts — the
    100 TB train side never shuffles for the join; the only wide exchange
    is the per-doc count aggregate, proportional to contaminated rows.
    Returns (id, n_shared_shingles) for contaminated documents only.
    """
    from data_management_service_run_etl_imputations_spark.operators.dedup import (
        shingle_hashes,
    )

    train_sh = shingle_hashes(train, id_col, text_col, k=k)
    eval_sh = shingle_hashes(eval_df, id_col, text_col, k=k).select(
        "h"
    ).distinct()
    if broadcast_eval:
        eval_sh = F.broadcast(eval_sh)
    return (
        train_sh.join(eval_sh, "h")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_shingles"))
    )


def source_mixture_sample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    basis: int = 10_000,
) -> DataFrame:
    """Deterministic source-balanced downsampling (the data-mixing step of
    an LLM corpus pipeline): every source is sampled down to the SMALLEST
    source's total weight, so the mixture is uniform across sources.

    Per-source keep threshold ``thr_i = (min_total * basis) div total_i``
    in INTEGER arithmetic (bit-identical in any engine — no float rounding
    at the keep boundary), applied to the scrambled doc id:
    ``scramble(id) mod basis < thr_i``. Fully deterministic — re-runs and
    engines agree row-for-row.

    Scale: per-source totals are one partial-aggregated shuffle over
    |sources| groups; the rate table is |sources| rows and broadcasts back
    onto the corpus scan; the keep filter is a pure column predicate. The
    corpus is never shuffled. ``min_total * basis`` bounds: safe below
    ~9·10¹⁴ total weight units per source at the default basis.
    """
    stats = df.groupBy(source_col).agg(F.sum(weight_col).alias("__t"))
    # unpartitioned window over |sources| rows — tiny by construction;
    # `div` (not /) keeps the threshold in integer arithmetic end-to-end.
    rates = stats.select(
        source_col,
        F.expr(f"(min(__t) over () * {basis}) div __t").alias("__thr"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(scramble(id_col) % basis < F.col("__thr"))
        .drop("__thr")
    )


def repetition_flags(
    df: DataFrame, text_col: str, n: int = 3, max_dup_frac: float = 0.2
) -> DataFrame:
    """Gopher-style within-document repetition filter: the fraction of
    word n-gram occurrences that are duplicates (Rae et al. 2021 §A1.1 use
    2–4-gram duplicate fractions; default 3). Boilerplate-heavy and
    looping text scores high and is dropped.

    Pure column expressions — the n-gram array, its distinct count, and
    the duplicate fraction are all computed inside whole-stage codegen; no
    shuffle, no UDF. Emits n_ngrams, dup_frac, keep.
    """
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    n_toks = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n_toks - (n - 1), F.lit(1)))
    ngrams = F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))
    n_ngrams = F.size(ngrams)
    dup_frac = (n_ngrams - F.size(F.array_distinct(ngrams))) / n_ngrams
    return df.select(
        df["*"],
        n_ngrams.cast("long").alias("n_ngrams"),
        F.round(dup_frac, 6).alias("dup_frac"),
        (dup_frac <= F.lit(max_dup_frac)).alias("keep"),
    )
