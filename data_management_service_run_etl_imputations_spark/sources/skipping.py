"""File-level statistics, data-skipping reads, and Z-order clustering for
manifest-committed tables — the zone-map half of the table protocol
(``sources/sinks.py``).

At 100 TB a predicate that survives partition pruning still faces every
file inside the matching partitions. Lakehouse engines close that gap with
per-file min/max statistics ("zone maps"): the reader drops any file whose
recorded [min, max] cannot intersect the predicate BEFORE the scan is
planned, so query cost tracks the files that can match, not the partition
size. Skipping is only as good as the physical layout — a column scattered
uniformly across files has every file's range spanning the whole domain —
so the companion operator is Z-ORDER clustering: rows are rewritten in
Morton-interleaved order of several columns' quantile ranks, giving every
file a narrow range in EACH clustered dimension at once (a linear sort
only narrows its leading column).

Design choices, and why they hold at scale:

- **Quantile ranks, not linear scaling.** Each clustered column is mapped
  to a ``2^bits``-bucket id through its own approximate quantile
  boundaries (``approxQuantile`` — driver receives a bounded list of
  cut points, never data). Linear min/max scaling collapses under skew
  (one hot value owns most buckets); equi-depth buckets keep every bucket
  ~equally populated regardless of distribution.
- **Codegen'd bucket lookup.** The value→bucket step is a BALANCED BINARY
  SEARCH TREE of nested ``CASE WHEN`` expressions (depth = ``bits``), not
  a higher-order ``aggregate`` over an array literal — it stays inside
  whole-stage codegen and costs ``bits`` comparisons per row.
- **One range shuffle.** The rewrite is a single
  ``repartitionByRange(partition, z)`` + within-partition sort; output
  files are contiguous (partition, z) ranges, which is exactly what makes
  their per-column min/max narrow.
- **Stats collected from the data just written** (grouped by
  ``input_file_name``) — one extra pass over the rewritten partitions
  only, never the table; stored in the next manifest version, so stats
  and data commit atomically together and time travel keeps them paired.

No instruction here derives from the reference (its storage layer is a
SQL-Server table, ``function_app.py:192-196``); this is the engine's own
scale extension, following the public Delta/Iceberg zone-map design.
"""

from __future__ import annotations

import glob
import os
import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.sources.sinks import (
    _latest_manifest,
    _manifest_dir,
    _publish_manifest,
)

__all__ = [
    "bucketize",
    "zorder_column",
    "with_zorder",
    "manifest_collect_stats",
    "manifest_cluster_zorder",
    "manifest_skipping_plan",
    "manifest_read_skipping",
    "manifest_collect_bloom",
    "manifest_point_plan",
    "manifest_read_point",
]


def bucketize(col: Column, boundaries: list[float]) -> Column:
    """Map a numeric column to its equi-depth bucket id in
    ``[0, len(boundaries)]`` via a balanced binary-search tree of nested
    ``CASE WHEN`` expressions (depth ``ceil(log2(n+1))`` comparisons per
    row, fully inside whole-stage codegen). ``boundaries`` must be sorted
    ascending; bucket ``i`` holds values in ``(boundaries[i-1],
    boundaries[i]]``. NULL maps to bucket 0 (NULLs sort first)."""

    def tree(lo: int, hi: int) -> Column:
        # invariant: value belongs to a bucket in [lo, hi]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return (
            F.when(col <= F.lit(boundaries[mid]), tree(lo, mid))
            .otherwise(tree(mid + 1, hi))
        )

    n = len(boundaries)
    if n == 0:
        return F.lit(0)
    return F.when(col.isNull(), F.lit(0)).otherwise(tree(0, n))


def zorder_column(bucket_cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits``-wide bucket ids into one long: output bit
    ``i * k + j`` is bit ``i`` of column ``j``. A contiguous range of the
    result is a small hyper-rectangle in bucket space, so files holding
    contiguous z-ranges have narrow min/max in EVERY interleaved column.
    ``k * bits`` must stay under 63."""
    k = len(bucket_cols)
    if k * bits > 62:
        raise ValueError(f"z-value would overflow a long: {k} cols × {bits} bits")
    z = F.lit(0).cast("long")
    for j, c in enumerate(bucket_cols):
        cl = c.cast("long")
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(cl, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return z


def with_zorder(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 8,
    name: str = "__z",
    relative_error: float = 0.001,
) -> DataFrame:
    """Attach a Z-order key built from equi-depth quantile ranks of
    ``cols``. One ``approxQuantile`` pass computes all columns' cut points
    together (Greenwald-Khanna sketch, driver receives ``k * 2^bits``
    floats — bounded regardless of row count)."""
    n_buckets = (1 << bits_per_col) - 1  # bucket ids 0..n_buckets fit in bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.stat.approxQuantile(cols, probs, relative_error)
    buckets = [
        bucketize(F.col(c).cast("double"), cut) for c, cut in zip(cols, cuts)
    ]
    return df.withColumn(name, zorder_column(buckets, bits_per_col))


def _json_safe(v):
    """Stats land in a JSON manifest: numerics stay numeric (range
    comparisons), everything else (dates, strings, decimals) serializes
    as str — comparisons on both sides then happen in the same domain."""
    if v is None or isinstance(v, (int, float, bool)):
        return v
    try:
        return float(v)  # Decimal and friends
    except (TypeError, ValueError):
        return str(v)


def _stats_for_dirs(
    spark, table_root: str, rel_dirs: list[str], cols: list[str], fmt: str
) -> dict[str, dict]:
    """Per-file stats for a set of partition directories in ONE job:
    {file_rel: {"rows": n, "cols": {c: {"min": v, "max": v, "nulls": n}}}}.
    File granularity comes free from ``input_file_name`` (no per-file or
    per-directory jobs); the grouped result is bounded — one row per data
    file."""
    if not rel_dirs:
        return {}
    df = spark.read.format(fmt).load(
        [f"{table_root}/{rel}" for rel in sorted(rel_dirs)]
    )
    aggs = [F.count(F.lit(1)).alias("__rows")]
    present = [c for c in cols if c in df.columns]
    for c in present:
        aggs += [
            F.min(c).alias(f"__min_{c}"),
            F.max(c).alias(f"__max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
        ]
    rows = (
        df.groupBy(F.input_file_name().alias("__file"))
        .agg(*aggs)
        .collect()  # bounded: one row per data FILE
    )
    root_abs = os.path.abspath(table_root)
    out: dict[str, dict] = {}
    for r in rows:
        d = r.asDict()
        uri = d["__file"]
        idx = uri.find(root_abs)
        frel = uri[idx + len(root_abs) + 1 :] if idx >= 0 else uri
        col_stats = {
            c: {
                "min": _json_safe(d[f"__min_{c}"]),
                "max": _json_safe(d[f"__max_{c}"]),
                "nulls": int(d[f"__nulls_{c}"]),
            }
            for c in present
        }
        out[frel] = {"rows": int(d["__rows"]), "cols": col_stats}
    return out


def manifest_collect_stats(
    spark, path: str, cols: list[str], partition_values: list | None = None
) -> dict[str, int]:
    """ANALYZE for a manifest table: compute per-file min/max/null-count
    for ``cols`` over the (selected) partitions and publish them in a new
    manifest version under ``"stats"``. Directories are immutable, so
    already-covered directories (every file present in the existing stats)
    are skipped — repeated runs after incremental upserts only scan new
    directories. Returns {"files": n, "directories": n}."""
    version, content = _latest_manifest(path)
    if version == 0:
        return {"files": 0, "directories": 0}
    fmt = content.get("fmt", "parquet")
    parts: dict = content["partitions"]
    stats: dict = dict(content.get("stats", {}))
    wanted = None if partition_values is None else {str(v) for v in partition_values}
    todo: list[str] = []
    for k, rel in sorted(parts.items()):
        if wanted is not None and k not in wanted:
            continue
        have = {f for f in stats if f.startswith(rel + "/")}
        on_disk = {
            f"{rel}/{os.path.basename(p)}"
            for p in glob.glob(f"{path}/{rel}/*.{fmt}")
        }
        if on_disk and on_disk <= have:
            continue  # immutable dir already fully covered
        todo.append(rel)
    fresh = _stats_for_dirs(spark, path, todo, cols, fmt)
    stats.update(fresh)
    n_files, n_dirs = len(fresh), len(todo)
    content = dict(content)
    content["stats"] = stats
    content["stats_cols"] = sorted(
        set(content.get("stats_cols", [])) | set(cols)
    )
    _publish_manifest(path, version + 1, content)
    return {"files": n_files, "directories": n_dirs}


def manifest_cluster_zorder(
    spark,
    path: str,
    zorder_cols: list[str],
    files_per_partition: int = 8,
    bits_per_col: int = 8,
    partition_values: list | None = None,
) -> dict[str, int]:
    """OPTIMIZE ZORDER BY for a manifest table: rewrite the (selected)
    partitions in Morton order of ``zorder_cols``' quantile ranks, split
    into ``files_per_partition`` contiguous z-ranges per partition, and
    publish data + per-file stats as ONE new manifest version (readers see
    the pre- or post-clustering snapshot — identical content — never a
    mix). One range shuffle; stats collection re-scans only the rewritten
    partitions. Returns {"partitions": n, "files": n}."""
    version, content = _latest_manifest(path)
    if version == 0:
        return {"partitions": 0, "files": 0}
    fmt = content.get("fmt", "parquet")
    pcol = content["partition_col"]
    parts: dict = dict(content["partitions"])
    selected = {
        k: rel
        for k, rel in parts.items()
        if partition_values is None or k in {str(v) for v in partition_values}
    }
    if not selected:
        return {"partitions": 0, "files": 0}

    df = spark.read.format(fmt).load(
        [f"{path}/{rel}" for rel in sorted(selected.values())]
    )
    dfz = with_zorder(df, zorder_cols, bits_per_col=bits_per_col)
    staged = (
        dfz.withColumn("__p", F.col(pcol).cast("string"))
        # contiguous (partition, z) ranges per task: each output file holds
        # one narrow z-slice of (almost always) one partition
        .repartitionByRange(
            max(1, files_per_partition * len(selected)), "__p", "__z"
        )
        .sortWithinPartitions("__p", "__z")
        .drop("__z")
    )
    stage = f"data/{uuid.uuid4().hex[:12]}"
    staged.write.mode("overwrite").partitionBy("__p").format(fmt).save(
        f"{path}/{stage}"
    )

    stats: dict = {
        f: s
        for f, s in content.get("stats", {}).items()
        if not any(f.startswith(rel + "/") for rel in selected.values())
    }
    new_rels = []
    for k in selected:
        rel = f"{stage}/__p={k}"
        parts[k] = rel
        new_rels.append(rel)
    fresh = _stats_for_dirs(spark, path, new_rels, zorder_cols, fmt)
    stats.update(fresh)
    n_files = len(fresh)
    content = dict(content)
    content["partitions"] = parts
    content["stats"] = stats
    content["stats_cols"] = sorted(
        set(content.get("stats_cols", [])) | set(zorder_cols)
    )
    _publish_manifest(path, version + 1, content)
    return {"partitions": len(selected), "files": n_files}


def manifest_skipping_plan(
    path: str,
    ranges: dict[str, tuple],
    version: int | None = None,
) -> tuple[list[str], int, int, dict]:
    """Plan a data-skipping scan: resolve a manifest version and return
    ``(kept_file_rels, n_kept, n_total, content)`` for a conjunction of
    closed-range predicates ``{col: (lo, hi)}`` (``None`` bound = open).
    A file is DROPPED only when its recorded stats PROVE no row can match:
    max < lo, min > hi, or the file is all-NULL in a filtered column.
    Files or columns without stats are kept — skipping is an optimization,
    never a correctness dependency."""
    if version is None:
        version, content = _latest_manifest(path)
    else:
        import json

        with open(f"{_manifest_dir(path)}/{version}.json") as f:
            content = json.load(f)
    fmt = content.get("fmt", "parquet")
    stats: dict = content.get("stats", {})
    kept: list[str] = []
    n_total = 0
    for rel in sorted(content["partitions"].values()):
        files = sorted(glob.glob(f"{path}/{rel}/*.{fmt}"))
        for p in files:
            n_total += 1
            frel = f"{rel}/{os.path.basename(p)}"
            s = stats.get(frel)
            if s is None:
                kept.append(frel)
                continue
            drop = False
            for c, (lo, hi) in ranges.items():
                cs = s["cols"].get(c)
                if cs is None:
                    continue
                if cs["min"] is None and cs["max"] is None:
                    drop = True  # all-NULL file cannot satisfy a range
                    break
                if lo is not None and cs["max"] is not None and cs["max"] < lo:
                    drop = True
                    break
                if hi is not None and cs["min"] is not None and cs["min"] > hi:
                    drop = True
                    break
            if not drop:
                kept.append(frel)
    return kept, len(kept), n_total, content


# --- file-level bloom index (point-lookup skipping) -----------------------
#
# Zone maps answer RANGE predicates; they are useless for an equality
# probe on a high-cardinality column that is not the clustering key (every
# file's [min, max] spans most of the domain). The lakehouse answer is a
# per-file BLOOM FILTER: k hashed bit positions per value, OR-ed into an
# m-bit set per file; a point lookup drops every file whose filter provably
# lacks the key (no false negatives; false positives only cost an extra
# file read). Build is one grouped aggregate per directory — positions via
# JVM-side xxhash64 (seeded, deterministic), per-file position SETS
# collected (bounded by m distinct values per file) and packed into the
# bitset driver-side; the manifest stores m/64 longs per file, committed
# atomically with the data they index.


def _bloom_positions(col: Column, bits: int, k: int) -> Column:
    """Array of k bit positions for a value: seeded xxhash64 mod m.
    Seeds are constants so build and probe agree by construction."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(bits)) for seed in range(k)]
    )


def manifest_collect_bloom(
    spark,
    path: str,
    col: str,
    bits: int = 8192,
    k: int = 4,
    partition_values: list | None = None,
) -> dict[str, int]:
    """Build/refresh the per-file bloom index for ``col`` over the
    (selected) partitions and publish it in a new manifest version under
    ``"bloom"``. Incremental like stats collection: immutable directories
    already covered are skipped, so post-upsert refreshes scan only new
    directories. Size ``bits`` for the expected rows-per-file (the classic
    ~10 bits/row keeps fpp ~1%). Returns {"files": n, "directories": n}."""
    version, content = _latest_manifest(path)
    if version == 0:
        return {"files": 0, "directories": 0}
    fmt = content.get("fmt", "parquet")
    parts: dict = content["partitions"]
    bloom: dict = dict(content.get("bloom", {}))
    entry = bloom.get(col)
    if entry is None or entry["bits"] != bits or entry["k"] != k:
        entry = {"bits": bits, "k": k, "files": {}}
    files: dict = dict(entry["files"])
    wanted = None if partition_values is None else {str(v) for v in partition_values}
    todo: list[str] = []
    for pk, rel in sorted(parts.items()):
        if wanted is not None and pk not in wanted:
            continue
        on_disk = {
            f"{rel}/{os.path.basename(p)}"
            for p in glob.glob(f"{path}/{rel}/*.{fmt}")
        }
        if on_disk and on_disk <= set(files):
            continue
        todo.append(rel)
    n_files = 0
    if todo:
        df = spark.read.format(fmt).load(
            [f"{path}/{rel}" for rel in sorted(todo)]
        )
        # xxhash64 is TYPE-sensitive (int 17 and bigint 17 hash apart):
        # record the column's dtype so the probe side casts its literal to
        # the exact build type — build and probe cannot drift.
        entry["dtype"] = df.schema[col].dataType.simpleString()
        rows = (
            df.select(
                F.input_file_name().alias("__file"),
                F.explode(_bloom_positions(F.col(col), bits, k)).alias("__pos"),
            )
            .groupBy("__file")
            # bounded: <= min(bits, k * rows_in_file) distinct positions
            # per file — the same information content as the bitset itself
            .agg(F.collect_set("__pos").alias("__set"))
            .collect()
        )
        root_abs = os.path.abspath(path)
        n_words = (bits + 63) // 64
        for r in rows:
            uri = r["__file"]
            idx = uri.find(root_abs)
            frel = uri[idx + len(root_abs) + 1 :] if idx >= 0 else uri
            words = [0] * n_words
            for pos in r["__set"]:
                words[pos >> 6] |= 1 << (pos & 63)
            files[frel] = words
            n_files += 1
    entry["files"] = files
    bloom[col] = entry
    content = dict(content)
    content["bloom"] = bloom
    _publish_manifest(path, version + 1, content)
    return {"files": n_files, "directories": len(todo)}


def manifest_point_plan(
    spark, path: str, col: str, value, version: int | None = None
) -> tuple[list[str], int, int, dict]:
    """Plan a point lookup through the bloom index: returns
    ``(kept_file_rels, n_kept, n_total, content)``. Probe positions come
    from evaluating THE SAME seeded-hash expression the build used (one
    1-row local job — xxhash64 lives JVM-side only), so build and probe
    cannot drift. Files without an index entry are kept."""
    if version is None:
        version, content = _latest_manifest(path)
    else:
        import json

        with open(f"{_manifest_dir(path)}/{version}.json") as f:
            content = json.load(f)
    fmt = content.get("fmt", "parquet")
    entry = content.get("bloom", {}).get(col)
    kept: list[str] = []
    n_total = 0
    positions: list[int] = []
    if entry is not None:
        probe = F.lit(value)
        if "dtype" in entry:
            probe = probe.cast(entry["dtype"])
        positions = spark.range(1).select(
            _bloom_positions(probe, entry["bits"], entry["k"]).alias("p")
        ).first()["p"]
    for rel in sorted(content["partitions"].values()):
        for p in sorted(glob.glob(f"{path}/{rel}/*.{fmt}")):
            n_total += 1
            frel = f"{rel}/{os.path.basename(p)}"
            words = None if entry is None else entry["files"].get(frel)
            if words is None or all(
                (words[pos >> 6] >> (pos & 63)) & 1 for pos in positions
            ):
                kept.append(frel)
    return kept, len(kept), n_total, content


def manifest_read_point(
    spark, path: str, col: str, value, version: int | None = None
) -> DataFrame:
    """Point lookup over a manifest table via the bloom index: open only
    files whose filter may contain ``value``, then apply the equality as
    an ordinary row filter (bloom false positives and multi-row keys fall
    through to it). Semantically identical to
    ``manifest_read(...).filter(col == value)``."""
    kept, _, _, content = manifest_point_plan(spark, path, col, value, version)
    fmt = content.get("fmt", "parquet")
    if not kept:
        schema = content.get("schema")
        if not schema:
            raise ValueError(f"manifest table at {path} has no schema")
        df = spark.createDataFrame([], schema)
    else:
        reader = spark.read.format(fmt)
        if fmt == "parquet":
            reader = reader.option("mergeSchema", "true")
        df = reader.load([f"{path}/{rel}" for rel in kept])
    return df.filter(F.col(col) == F.lit(value))


def manifest_read_skipping(
    spark,
    path: str,
    ranges: dict[str, tuple],
    version: int | None = None,
) -> DataFrame:
    """Read a manifest table through file-level data skipping, then apply
    the same ranges as an ordinary row filter (stats prune whole files;
    the filter handles partial overlaps — and parquet row-group pruning
    picks up the remainder from the pushed-down predicate). Semantically
    identical to ``manifest_read(...).filter(...)``; on a Z-ordered table
    the scan opens only the files whose zone intersects the box."""
    kept, _, _, content = manifest_skipping_plan(path, ranges, version)
    fmt = content.get("fmt", "parquet")
    if not kept:
        schema = content.get("schema")
        if not schema:
            raise ValueError(f"manifest table at {path} has no schema")
        df = spark.createDataFrame([], schema)
    else:
        reader = spark.read.format(fmt)
        if fmt == "parquet":
            reader = reader.option("mergeSchema", "true")
        df = reader.load([f"{path}/{rel}" for rel in kept])
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            cond = cond & (F.col(c) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(c) <= F.lit(hi))
    return df.filter(cond)
