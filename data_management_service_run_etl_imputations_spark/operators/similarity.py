"""Similarity search over embedding columns (``array<float>``) — engine
extension (BASELINE.json north_star).

Two tiers, same API shape:
- :func:`brute_force_topk` — exact cosine top-k; the correctness baseline.
  Cost: |queries| × |corpus| dot products, all JVM-side. Right answer for
  small query sets; at 100 TB it's the verifier, not the path.
- :func:`lsh_topk` — random-hyperplane LSH: bucket by sign bits, search only
  the query's bucket. Sub-linear candidates; recall measured in tests
  against brute force. Multi-probe (hamming-1 neighbor buckets) to trade
  compute for recall.

Also :func:`embedding_near_duplicates` — cosine-threshold near-dup pairs,
the embedding leg of the dedup family.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_col(a, b):
    """Cosine similarity between two array columns, double precision."""
    return _dot(a, b) / (_norm(a) * _norm(b))



def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against the
    corpus, rank per query. Returns (query_id, neighbor_id, cosine, rank);
    self-matches excluded. Deterministic tie-break on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def hyperplanes(dims: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit-free; only the sign matters)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dims)] for _ in range(n_planes)]


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id for a vector column given fixed hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = _dot(
            F.col(vec_col) if isinstance(vec_col, str) else vec_col,
            F.array(*[F.lit(w) for w in plane]),
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 4,
    multiprobe: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH — ``n_tables``
    independent sign-bit hashes of ``n_planes`` bits; a corpus vector is a
    candidate if it shares a (table, bucket) with the query in ANY table
    (plus hamming-1 probe buckets when ``multiprobe``). Exact cosine rank
    within candidates.

    Scale shape: the corpus is replicated n_tables× into narrow (table,
    bucket, id, vec) rows — the classic memory-for-recall trade — and the
    candidate search is an equi-join on (table, bucket): shuffle ∝ bucket
    collisions, never |Q|×|C|. Tune n_planes (bucket granularity) and
    n_tables/multiprobe (recall) per corpus density.
    """
    tables = [
        hyperplanes(dims, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket_col(vec_col, planes).alias("bucket"),
                    )
                    for t, planes in enumerate(tables)
                ]
            )
        ).alias("tb"),
    ).select("neighbor_id", "c_vec", "tb.tbl", "tb.bucket")

    probe_structs = []
    for t, planes in enumerate(tables):
        base = lsh_bucket_col(vec_col, planes)
        probe_structs.append(F.struct(F.lit(t).alias("tbl"), base.alias("bucket")))
        if multiprobe:
            probe_structs.extend(
                F.struct(
                    F.lit(t).alias("tbl"),
                    base.bitwiseXOR(F.lit(1 << i)).cast("long").alias("bucket"),
                )
                for i in range(n_planes)
            )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(F.array(*probe_structs)).alias("tb"),
    ).select("query_id", "q_vec", "tb.tbl", "tb.bucket")

    scored = (
        F.broadcast(q)
        .join(c, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", cosine_col(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold (exact all-pairs —
    use only where the corpus side fits a cross join; the LSH bucket join
    above is the scale path for the same predicate)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_duplicates_blocked(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_cells: int | None = None,
    seed: int = 42,
    stats_out: dict | None = None,
    adaptive: bool = True,
    target_block_rows: int = 4096,
    single_block_rows: int | None = None,
    n_rows: int | None = None,
    route: str = "exact",
) -> DataFrame:
    """Exact cosine-threshold near-dup pairs WITHOUT an all-pairs join:
    metric blocking with a triangle-inequality cell-pair bound.

    On unit-normalized vectors ``cos(a,b) ≥ t ⇔ ‖â−b̂‖ ≤ D = √(2−2t)``, so
    a KMeans coarse quantizer (the same idea as :func:`ivf_topk`'s IVF
    layout) partitions the corpus into cells, and a pair of cells can hold
    a matching pair only if ``‖c₁−c₂‖ ≤ r₁ + r₂ + D`` (centroid distance vs
    cell radii — triangle inequality, hence EXACT recall, unlike LSH which
    trades recall for candidates and at low thresholds generates *more*
    candidates than brute force). Survivor cell pairs drive an equi-join on
    cell id; the exact cosine filter runs only inside those blocks.

    Scale shape: the physical plan is broadcast(cell-pair table) +
    equi-joins on cell id — no cartesian/BNLJ node; shuffle is partitioned
    by cell, per-task memory bounded by the largest cell. ``n_cells=None``
    (default) auto-sizes to ~√|corpus| clamped to [16, 2048] — √n is the
    usual IVF pick, the cap bounds the driver-side O(n_cells²) cell-pair
    scan. At real near-dup thresholds (t ≥ 0.9 ⇒ D ≤ 0.45) most cell
    pairs are pruned; as t → 0 the bound keeps every cell pair and the
    cost honestly degrades toward all-pairs — the correct price for an
    exact answer at a loose threshold. In that degraded regime
    ``adaptive=True`` agglomerates the surviving fine cells into
    super-blocks of ~``target_block_rows`` rows (driver-side weighted
    Lloyd's over the centroids, exactness preserved — see the inline
    proof), so shuffle degree and applyInPandas group count shrink by the
    merge factor while candidate volume stays identical.

    The final cosine runs on the ORIGINAL vectors in float64 (BLAS matmul
    per cell-pair block); it agrees with :func:`embedding_near_duplicates`
    to the last few ulps (summation-order difference only), which the
    6-decimal output rounding absorbs — differential tests compare the
    rounded outputs. Clustering QUALITY never affects recall (any
    partition is exact — it only moves the pruning rate), so the KMeans
    fit is capped at 10 iterations.

    ``route``: ``"exact"`` (default) always scores the surviving blocks —
    the exact answer at whatever cost the data demands. ``"auto"``
    detects the distance-concentration regime (cell-pair survival still
    > 25% AFTER coarsening) and reroutes candidate generation through
    banded angular LSH (:func:`embedding_near_duplicates_lsh` — exact
    verify, documented recall, candidate volume ≪ brute force on
    high-dim data). ``"lsh"`` forces that route.
    """
    import math

    if route not in ("exact", "auto", "lsh"):
        raise ValueError(f"route must be exact|auto|lsh, got {route!r}")
    if route == "lsh":
        # forced LSH: take it BEFORE the quantizer — paying the
        # cardinality probe, sample collect, k-means fit, and
        # full-corpus assignment only to discard them would be two
        # wasted corpus passes (code-review r11)
        lsh_stats: dict = {}
        out = embedding_near_duplicates_lsh(
            df,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            seed=seed,
            stats_out=lsh_stats if stats_out is not None else None,
        )
        if stats_out is not None:
            stats_out.update({**lsh_stats, "routed": "lsh"})
        return out

    d_bound = math.sqrt(max(0.0, 2.0 - 2.0 * threshold))

    norm = _norm(F.col(vec_col))
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.transform(
            F.col(vec_col), lambda x: x.cast("double") / norm
        ).alias("__unit"),
    )
    # Quantizer (big-corpus path): seeded Lloyd's k-means on a bounded
    # sample of unit vectors, trained DRIVER-SIDE (FAISS trains coarse
    # quantizers on samples for the same reason).
    # Cardinality probe: one JVM-ONLY count() (Catalyst prunes every
    # projection, so it reads no vector bytes and spins no Python
    # workers). The previous design fused sample + count into one
    # mapInPandas pass; at bench scale that Python pass WAS the
    # wall-clock floor (~1.0 s of the 1.7 s strict run at sf0.1: Arrow
    # transfer of every unit vector + Python worker startup, all
    # discarded whenever the short-circuit then fired). Two JVM jobs
    # beat one Python job, and on the short-circuit path the quantizer
    # sample is never collected at all; on the big-corpus path it
    # collects via JVM-side Bernoulli sample() below. Clustering
    # QUALITY only moves the pruning rate, never recall (any partition
    # is exact), so a Bernoulli sample is as good as per-partition
    # heads. Driver-side numpy Lloyd's replaces an MLlib fit because
    # the fit was the measured wall-clock floor at bench scale (~5 s
    # multi-stage overhead for 2k vectors); Lloyd's on <=64k x dims is
    # milliseconds.
    fit_cap = 65536
    # n_rows hint: callers that already know the EXACT corpus size (e.g.
    # they just aggregated it to build the input) pass it to skip the
    # cardinality-probe job — at bench scale that job is a third of the
    # strict query's wall clock. The hint only steers path choice
    # (short-circuit vs blocked) and quantizer sizing, never
    # correctness; an inexact hint risks only a mis-sized plan (an
    # over-large "single block"), so pass exact counts or None.
    if n_rows is None:
        n_rows = df.count()
    if n_rows == 0:
        # empty corpus: no pairs (the unguarded path would crash inside
        # rng.choice on a zero-length sample)
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )
    if single_block_rows is None:
        single_block_rows = target_block_rows
    if n_rows <= single_block_rows:
        # SMALL-CORPUS SHORT-CIRCUIT: below the per-block size target a
        # single block holds the whole corpus, so the quantizer, the
        # radii job, and the cell-pair bound can only ADD jobs (adaptive
        # coarsening would collapse to ~4 cells with zero pruning
        # anyway). Score everything as ONE block — same chunked-BLAS
        # scorer, same exact output, two jobs total instead of five.
        # The planner choice every index makes: don't build one the
        # data can't amortize.
        if stats_out is not None:
            stats_out.update(
                {
                    "n_rows": n_rows,
                    "n_cells": 1,
                    "n_cell_pairs_total": 1,
                    "n_cell_pairs_survived": 1,
                    "candidate_volume": n_rows * (n_rows - 1) // 2,
                    "brute_force_volume": n_rows * (n_rows - 1) // 2,
                    "d_bound": d_bound,
                    "threshold": threshold,
                    "coarsened": False,
                    "short_circuit": True,
                }
            )
        def _score_all(batches):
            chunks = [b for b in batches if len(b)]
            if not chunks:
                return
            pdf = pd.concat(chunks)
            ids = pdf["__id"].to_numpy()
            A = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
            na = np.sqrt((A * A).sum(axis=1))
            for lo in range(0, len(A), 2048):
                hi = min(lo + 2048, len(A))
                cos = (A[lo:hi] @ A.T) / np.outer(na[lo:hi], na)
                mask = (cos >= threshold) & (
                    ids[lo:hi, None] < ids[None, :]
                )
                ii, jj = np.nonzero(mask)
                if len(ii):
                    yield pd.DataFrame(
                        {
                            "id_a": ids[lo + ii],
                            "id_b": ids[jj],
                            "cosine": cos[ii, jj],
                        }
                    )

        scored = (
            base.select("__id", "__vec")
            .coalesce(1)  # one task, no shuffle: the corpus fits a block
            .mapInPandas(
                _score_all, schema="id_a long, id_b long, cosine double"
            )
        )
        return scored.select(
            "id_a", "id_b", F.round("cosine", 6).alias("cosine")
        )
    # quantizer sample (big-corpus path only): JVM-side Bernoulli
    # sample, oversampled 1.2x then capped — one projection-pruned job
    # that ships at most fit_cap unit vectors to the driver
    frac = min(1.0, (fit_cap * 1.2) / n_rows)
    sample_rows = (
        base.select("__unit").sample(fraction=frac, seed=seed)
        .limit(fit_cap)
        .collect()
    )
    if not sample_rows:  # tiny-fraction edge: fall back to a head
        sample_rows = (
            base.select("__unit").limit(min(fit_cap, n_rows)).collect()
        )
    sample = np.array(
        [r["__unit"] for r in sample_rows], dtype=np.float64
    )
    if n_cells is None:
        n_cells = min(2048, max(16, int(math.isqrt(n_rows))))

    def _d2(rows: "np.ndarray", cs: "np.ndarray") -> "np.ndarray":
        # ‖a−b‖² = ‖a‖² − 2a·b + ‖b‖² — O(n·k) memory, BLAS matmul, no
        # n×k×dims broadcast tensor
        return (
            (rows * rows).sum(axis=1)[:, None]
            - 2.0 * (rows @ cs.T)
            + (cs * cs).sum(axis=1)[None, :]
        )

    rng = np.random.RandomState(seed)
    k = min(n_cells, len(sample))
    cents = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(10):
        lbl = _d2(sample, cents).argmin(axis=1)
        for c in range(k):
            members = sample[lbl == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    centroids = [[float(x) for x in c] for c in cents]

    cent_arr = cents.copy()

    @F.pandas_udf("cell int, dist double")
    def assign_pd(unit: pd.Series) -> pd.DataFrame:
        u = np.stack(unit.to_numpy()).astype(np.float64)
        d2 = _d2(u, cent_arr)
        cell = d2.argmin(axis=1)
        # clip: the Gram form can go -1e-16 on exact-centroid rows
        dist = np.sqrt(np.maximum(d2[np.arange(len(u)), cell], 0.0))
        return pd.DataFrame({"cell": cell.astype("int32"), "dist": dist})

    assigned = base.withColumn("__a", assign_pd("__unit")).select(
        "__id", "__vec",
        F.col("__a.cell").alias("cell"),
        F.col("__a.dist").alias("__dist"),
    )
    # Materialize the assignment once (localCheckpoint): the radii
    # aggregate and both sides of the scoring union then re-read the
    # checkpointed partitions instead of re-running the parquet scan +
    # assignment UDF (three passes otherwise). Lazy: the blocks persist
    # as a side effect of the radii job below — no separate
    # materialization job. Non-replayable on executor loss — the same
    # tradeoff as the connected-components iteration in dedup.py; the
    # operator re-runs from source on failure.
    assigned = assigned.localCheckpoint(eager=False)
    # Radii + sizes: one tiny aggregate (n_cells rows) collected at plan
    # time (sizes feed the candidate-volume diagnostic in stats_out).
    cell_rows = (
        assigned.groupBy("cell")
        .agg(F.max("__dist").alias("r"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    radii = {r["cell"]: r["r"] for r in cell_rows}
    cell_sizes = {r["cell"]: r["n"] for r in cell_rows}

    def _cdist(i: int, j: int) -> float:
        return math.sqrt(
            sum((x - y) ** 2 for x, y in zip(centroids[i], centroids[j]))
        )

    def _survivors() -> tuple[list[int], list[tuple[int, int]]]:
        # 1e-9 slack: the bound holds with real arithmetic; the slack
        # keeps a borderline cell pair (equality up to float rounding)
        # on the safe side
        cs = sorted(radii)
        return cs, [
            (c1, c2)
            for i, c1 in enumerate(cs)
            for c2 in cs[i:]
            if _cdist(c1, c2) <= radii[c1] + radii[c2] + d_bound + 1e-9
        ]

    cells, pairs = _survivors()

    # Adaptive block coarsening — the loose-threshold regime. When the
    # bound keeps most cell pairs (t → 0 ⇒ D → √2 dwarfs the centroid
    # spread), fine cells no longer prune anything and only multiply
    # cost: each vector is shuffled once per surviving pair of its cell
    # (≈ n_cells copies) and every surviving pair is an applyInPandas
    # group. Agglomerating cells into super-blocks of ~target_block_rows
    # rows keeps the SAME candidate volume but divides shuffle degree and
    # group count by the merge factor. Exactness is preserved: for a
    # point p in member cell i of super-block S, ‖p−c_S‖ ≤ ‖p−c_i‖ +
    # ‖c_i−c_S‖ ≤ r_i + ‖c_i−c_S‖ ≤ R_S, so the super-block radius is a
    # valid (wider) triangle bound. At large n the memory target itself
    # (k₂ = ⌈n/target_block_rows⌉ ≥ n_cells) disables coarsening: fine
    # cells are already big enough to amortize per-group overhead, and
    # merging them would blow the per-task block budget. The remap is a
    # literal lookup array on the existing cell column — no second pass
    # over the vectors.
    coarsened = False
    n_cells_initial, n_pairs_initial = len(cells), len(pairs)
    total0 = len(cells) * (len(cells) + 1) // 2
    k2 = max(4, -(-n_rows // target_block_rows))
    if adaptive and k2 < len(cells) and len(pairs) > 0.25 * total0:
        live = list(cells)
        W = np.array([cell_sizes[c] for c in live], dtype=np.float64)
        C = cents[np.array(live)]
        k2 = min(k2, len(live))
        sup_c = C[rng.choice(len(live), size=k2, replace=False)]
        for _ in range(10):
            lbl2 = _d2(C, sup_c).argmin(axis=1)
            for s in range(k2):
                m = lbl2 == s
                if m.any():
                    sup_c[s] = np.average(C[m], axis=0, weights=W[m])
        lbl2 = _d2(C, sup_c).argmin(axis=1)
        sup_of = {c: int(lbl2[i]) for i, c in enumerate(live)}
        new_radii: dict[int, float] = {}
        new_sizes: dict[int, int] = {}
        for i, c in enumerate(live):
            s = sup_of[c]
            d_cs = float(np.sqrt(((C[i] - sup_c[s]) ** 2).sum()))
            new_radii[s] = max(new_radii.get(s, 0.0), d_cs + radii[c])
            new_sizes[s] = new_sizes.get(s, 0) + cell_sizes[c]
        lut = [sup_of.get(c, 0) for c in range(len(centroids))]
        assigned = assigned.withColumn(
            "cell",
            F.element_at(
                F.array(*[F.lit(int(s)) for s in lut]), F.col("cell") + 1
            ).cast("int"),
        )
        radii, cell_sizes = new_radii, new_sizes
        centroids = [[float(x) for x in c] for c in sup_c]
        cells, pairs = _survivors()
        coarsened = True

    # DISTANCE-CONCENTRATION ESCAPE HATCH (VERDICT r10 "Next round" #5):
    # when even the coarsened blocks keep >25% of cell pairs — the
    # telemetry signature of high-dim uniform-ish data, where the
    # triangle bound honestly cannot prune — ``route="auto"`` hands
    # candidate generation to banded angular LSH
    # (:func:`embedding_near_duplicates_lsh`): collision probability
    # there depends only on pair ANGLE, immune to concentration, with
    # documented recall (exact duplicates found with certainty) instead
    # of exact-but-quadratic super-blocks. ``route="exact"`` (default)
    # keeps the exact guarantee regardless of cost — the oracle-checked
    # catalog queries use it. The reroute is RECALL-GATED: bands are
    # sized so borderline pairs at ``threshold`` are found with
    # probability ≥ 0.98 (bands = ⌈ln(0.02)/ln(1−p_band)⌉ for
    # p_band = (1−θ/π)^12); if no band count ≤ 64 reaches that floor
    # (loose thresholds, e.g. t ≤ 0.8 needs ~60, t = 0.5 needs ~500),
    # auto stays EXACT — trading a silent 10–80% recall collapse for
    # honest all-pairs cost is never the right default (code-review
    # r11).
    total_after = len(cells) * (len(cells) + 1) // 2
    if route == "auto" and len(pairs) > 0.25 * total_after:
        _lsh_planes = 12
        theta = math.acos(max(-1.0, min(1.0, threshold)))
        p_band = (1.0 - theta / math.pi) ** _lsh_planes
        need_bands = (
            math.ceil(math.log(0.02) / math.log(1.0 - p_band))
            if 0.0 < p_band < 1.0
            else 16
        )
        if need_bands <= 64:
            lsh_stats: dict = {}
            out = embedding_near_duplicates_lsh(
                df,
                id_col=id_col,
                vec_col=vec_col,
                threshold=threshold,
                n_planes=_lsh_planes,
                bands=max(16, need_bands),
                seed=seed,
                stats_out=lsh_stats if stats_out is not None else None,
            )
            if stats_out is not None:
                stats_out.update(
                    {
                        **lsh_stats,
                        "routed": "lsh",
                        "n_cell_pairs_total": total_after,
                        "n_cell_pairs_survived": len(pairs),
                        "coarsened": coarsened,
                    }
                )
            return out
        elif stats_out is not None:
            # concentration detected but LSH can't meet the recall
            # floor at this threshold — staying exact, recorded so the
            # telemetry shows the decision
            stats_out["lsh_declined_bands_needed"] = need_bands

    if stats_out is not None:
        # pruning-evidence hook for scale probes: how many cell pairs
        # survived the triangle-inequality bound, and how many vector
        # comparisons (candidate volume) the surviving blocks imply vs
        # the n·(n−1)/2 of brute force
        stats_out.update(
            {
                "n_rows": n_rows,
                "n_cells": len(cells),
                "n_cell_pairs_total": len(cells) * (len(cells) + 1) // 2,
                "n_cell_pairs_survived": len(pairs),
                "candidate_volume": sum(
                    cell_sizes[c1] * (cell_sizes[c1] - 1) // 2
                    if c1 == c2
                    else cell_sizes[c1] * cell_sizes[c2]
                    for c1, c2 in pairs
                ),
                "brute_force_volume": n_rows * (n_rows - 1) // 2,
                "d_bound": d_bound,
                "threshold": threshold,
                "coarsened": coarsened,
                "n_cells_initial": n_cells_initial,
                "n_cell_pairs_survived_initial": n_pairs_initial,
            }
        )
    return _score_cell_blocks(df.sparkSession, assigned, pairs, threshold)


def _score_cell_blocks(
    spark, assigned: DataFrame, pairs: list, threshold: float
) -> DataFrame:
    """Score the surviving cell pairs: one applyInPandas per CELL PAIR,
    chunked BLAS matmul inside. Each vector is shuffled once per
    surviving pair its cell belongs to (≤ n_cells+1 copies) — candidate
    PAIRS are never materialized as rows, which is what makes the
    loose-threshold regime (every cell pair survives) |V|·deg shuffle
    volume instead of |V|² rows. Measured at 10× sf0.1 (20k vecs,
    all-pairs regime): 813 s as a pair-row join + interpreted-HOF
    cosine → ~9 s this way. ``assigned`` needs (__id, __vec, cell)."""
    pair_df = spark.createDataFrame(pairs, "c1 INT, c2 INT")

    sides = (
        assigned.join(
            F.broadcast(pair_df), assigned["cell"] == pair_df["c1"]
        ).select("c1", "c2", F.lit("a").alias("side"), "__id", "__vec")
    ).unionByName(
        assigned.join(
            F.broadcast(
                pair_df.filter(F.col("c1") != F.col("c2"))
            ),
            assigned["cell"] == pair_df["c2"],
        ).select("c1", "c2", F.lit("b").alias("side"), "__id", "__vec")
    )

    empty = pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "cosine": pd.Series(dtype="float64"),
        }
    )

    def _score_block(pdf: pd.DataFrame) -> pd.DataFrame:
        # same-cell is a property of the GROUP KEY (an empty side in a
        # cross-cell pair must not degrade into a within-cell block — that
        # would double-count pairs already owned by the (c,c) group)
        same_cell = bool(pdf["c1"].iloc[0] == pdf["c2"].iloc[0])
        a_rows = pdf[pdf["side"] == "a"]
        if not len(a_rows):
            return empty
        ids_a = a_rows["__id"].to_numpy()
        A = np.stack(a_rows["__vec"].to_numpy()).astype(np.float64)
        na = np.sqrt((A * A).sum(axis=1))
        if same_cell:
            ids_b, B, nb = ids_a, A, na
        else:
            b_rows = pdf[pdf["side"] == "b"]
            if not len(b_rows):
                return empty
            ids_b = b_rows["__id"].to_numpy()
            B = np.stack(b_rows["__vec"].to_numpy()).astype(np.float64)
            nb = np.sqrt((B * B).sum(axis=1))
        out_a, out_b, out_c = [], [], []
        # chunk the matmul so block memory stays bounded by chunk×|B|
        for lo in range(0, len(A), 2048):
            hi = min(lo + 2048, len(A))
            cos = (A[lo:hi] @ B.T) / np.outer(na[lo:hi], nb)
            if same_cell:
                # each unordered pair once: id_a < id_b
                mask = (cos >= threshold) & (
                    ids_a[lo:hi, None] < ids_b[None, :]
                )
            else:
                mask = cos >= threshold
            ii, jj = np.nonzero(mask)
            out_a.append(ids_a[lo + ii])
            out_b.append(ids_b[jj])
            out_c.append(cos[ii, jj])
        ida = np.concatenate(out_a) if out_a else np.array([], dtype="int64")
        idb = np.concatenate(out_b) if out_b else np.array([], dtype="int64")
        cc = np.concatenate(out_c) if out_c else np.array([], dtype="float64")
        return pd.DataFrame(
            {
                "id_a": np.minimum(ida, idb),
                "id_b": np.maximum(ida, idb),
                "cosine": cc,
            }
        )

    scored = sides.groupBy("c1", "c2").applyInPandas(
        _score_block, schema="id_a long, id_b long, cosine double"
    )
    return scored.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-style approximate top-k: a KMeans coarse quantizer partitions the
    corpus into ``n_centroids`` cells; each query searches only its
    ``n_probe`` nearest cells, exact-ranking within candidates.

    Scale shape: the quantizer is fit once on a sample (driver holds only
    n_centroids × dims floats); assignment is a map with a broadcast
    centroid table; the search is an equi-join on cell id — candidates
    ∝ n_probe/n_centroids of the corpus, never |Q|×|C|. The classic
    FAISS-IVF layout rendered as DataFrame ops.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_v = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    # maxIter capped: quantizer quality moves recall marginally (probed in
    # tests); default 20 iterations doubles fit time for no measured gain
    km = KMeans(
        k=n_centroids, seed=seed, maxIter=10,
        featuresCol="features", predictionCol="cell",
    )
    model = km.fit(corpus_v)
    assigned = model.transform(corpus_v).select("neighbor_id", "c_vec", "cell")

    # Query → its n_probe nearest centroids (centroid table is tiny: rank
    # per query over a broadcast cross of n_centroids rows).
    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    cent_df = queries.sparkSession.createDataFrame(centroids, "cell INT, centroid ARRAY<DOUBLE>")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_cells = (
        q.join(F.broadcast(cent_df))
        .withColumn("dist", -cosine_col(F.col("q_vec"), F.col("centroid")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("dist", "cell")
            ),
        )
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "q_vec", "cell")
    )

    scored = (
        F.broadcast(q_cells)
        .join(assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", cosine_col(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m_subspaces: int = 8,
    ks_codes: int = 16,
    refine_factor: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ approximate top-k — the memory-compression scale path for
    ANN (FAISS ``IVFx,PQy`` rendered as DataFrame ops): a KMeans coarse
    quantizer restricts each query to ``n_probe`` cells; within candidates,
    vectors are represented by ``m_subspaces`` one-byte codes (nearest
    per-subspace codebook centroid) instead of full floats, scored by
    asymmetric distance (ADC: sum of per-subspace query→centroid distances
    from a lookup table), and the ADC shortlist (``k·refine_factor``) is
    exactly re-ranked with true cosine.

    Why it scales: the 100 TB corpus is stored as m bytes + a cell id per
    vector (64-dim float32 → 8 bytes is 32×); the ADC lookup table is
    |Q|·m·ks rows and BROADCASTS; candidate scoring is an equi-join on the
    cell id plus a broadcast LUT join — full vectors are touched only for
    the shortlist re-rank. Codebooks train as m independent KMeans fits
    (distributed; driver holds m·ks·(dims/m) floats).

    Vectors are L2-normalized first, so squared-L2 ADC ranking ≡ cosine
    ranking (d² = 2 − 2·cos on the unit sphere).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # --- normalize (unit sphere) --------------------------------------
    def normed(col):
        n = F.sqrt(F.aggregate(
            col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        ))
        return F.transform(col, lambda x: x.cast("double") / n)

    corpus_n = corpus.select(
        F.col(id_col).alias("neighbor_id"), normed(F.col(vec_col)).alias("c_vec")
    )
    queries_n = queries.select(
        F.col(id_col).alias("query_id"), normed(F.col(vec_col)).alias("q_vec")
    )

    dims = len(corpus.select(vec_col).first()[0])
    if dims % m_subspaces:
        raise ValueError(f"dims {dims} not divisible by m={m_subspaces}")
    d_sub = dims // m_subspaces

    # --- coarse quantizer (IVF cells) ---------------------------------
    corpus_f = corpus_n.withColumn(
        "features", array_to_vector(F.col("c_vec"))
    )
    coarse = KMeans(
        k=n_centroids, seed=seed, maxIter=10,
        featuresCol="features", predictionCol="cell",
    ).fit(corpus_f)
    assigned = coarse.transform(corpus_f).select("neighbor_id", "c_vec", "cell")

    # --- PQ codebooks: m independent KMeans fits on subvectors --------
    sub_models = []
    for j in range(m_subspaces):
        sub_f = corpus_n.select(
            array_to_vector(
                F.slice(F.col("c_vec"), j * d_sub + 1, d_sub)
            ).alias("features")
        )
        sub_models.append(
            KMeans(
                k=ks_codes, seed=seed + j, maxIter=10, featuresCol="features",
                predictionCol=f"code_{j}",
            ).fit(sub_f)
        )

    # --- encode: m narrow transforms, then codes → long (id, j, code) --
    enc = assigned
    for j, mdl in enumerate(sub_models):
        enc = mdl.transform(
            enc.withColumn(
                "features",
                array_to_vector(F.slice(F.col("c_vec"), j * d_sub + 1, d_sub)),
            )
        ).drop("features")
    codes_long = enc.select(
        "neighbor_id", "cell",
        F.posexplode(F.array(*[F.col(f"code_{j}") for j in range(m_subspaces)]))
        .alias("sub", "code"),
    )

    # --- ADC lookup table: |Q| × m × ks rows, broadcastable -----------
    spark = corpus.sparkSession
    cent_rows = [
        (j, c, [float(x) for x in mdl.clusterCenters()[c]])
        for j, mdl in enumerate(sub_models)
        for c in range(ks_codes)
    ]
    cent_pq = spark.createDataFrame(
        cent_rows, "sub INT, code INT, centroid ARRAY<DOUBLE>"
    )
    lut = (
        queries_n.join(F.broadcast(cent_pq))
        .select(
            "query_id", "sub", "code",
            F.aggregate(
                F.zip_with(
                    F.slice(F.col("q_vec"), F.col("sub") * d_sub + 1, d_sub),
                    F.col("centroid"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )

    # --- query → n_probe nearest cells (as in ivf_topk) ----------------
    coarse_cents = [
        (i, [float(x) for x in c]) for i, c in enumerate(coarse.clusterCenters())
    ]
    cent_df = spark.createDataFrame(coarse_cents, "cell INT, centroid ARRAY<DOUBLE>")
    q_cells = (
        queries_n.join(F.broadcast(cent_df))
        # true L2² to the (non-unit) centroid — a dot-product ranking is
        # only correct when all centroids share a norm, which KMeans means
        # do not
        .withColumn(
            "dist",
            F.aggregate(
                F.zip_with(
                    F.col("q_vec"), F.col("centroid"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("dist", "cell")
            ),
        )
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "cell")
    )

    # --- candidates × m codes, ADC sum, shortlist ----------------------
    adc = (
        F.broadcast(q_cells)
        .join(codes_long, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    w_adc = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    shortlist = (
        adc.withColumn("srk", F.row_number().over(w_adc))
        .filter(F.col("srk") <= k * refine_factor)
        .select("query_id", "neighbor_id")
    )

    # --- exact re-rank of the shortlist -------------------------------
    rescored = (
        shortlist.join(
            queries_n.withColumnRenamed("q_vec", "qv"), "query_id"
        )
        .join(
            corpus_n.withColumnRenamed("c_vec", "cv"), "neighbor_id"
        )
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
        )
    )


# --- persisted IVF-PQ index (build once, query many) ----------------------
#
# ivf_pq_topk refits its quantizers on every invocation — fine for a
# one-shot dedup pass, wrong for the serving shape real pipelines have:
# build the index ONCE over the (slowly-changing) corpus, then answer
# many query batches against it. The persisted layout is two manifest
# tables under the index root (transactional, versioned, restart-safe,
# vacuumable — the same table protocol as any other data):
#
#   {root}/vectors  (neighbor_id, c_vec, codes)   PARTITIONED BY cell
#   {root}/meta     (kind, cell, sub, code, centroid)
#
# Partitioning the coded vectors BY CELL is the scale move: a query
# batch probes n_probe cells, so the read plans through manifest
# partition pruning and touches only those cells' files — at 100 TB the
# scan cost is n_probe/n_centroids of the corpus by construction, with
# zero filesystem listing. `meta` holds the coarse centroids, the m×ks
# PQ codebook centroids, and one params row; the whole sidecar is
# n_centroids×dims + m×ks×(dims/m) floats — driver-bounded by design
# (FAISS keeps the same arrays in RAM).

_ANN_PARAMS_KIND = "params"


def embedding_near_duplicates_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    bands: int = 16,
    seed: int = 42,
    stats_out: dict | None = None,
) -> DataFrame:
    """Near-dup pairs by BANDED ANGULAR LSH candidates + exact cosine
    verify — the HIGH-DIMENSIONAL candidate route (VERDICT r10 "Next
    round" #5). Metric blocking
    (:func:`embedding_near_duplicates_blocked`) is exact but relies on
    cluster structure: in the distance-concentration regime (high-dim,
    uniform-ish corpora) the triangle bound keeps most cell pairs and
    cost honestly degrades toward all-pairs. Sign-random-projection LSH
    does not concentrate the same way: collision probability depends
    only on the ANGLE between two vectors — ``P(same bit) = 1 − θ/π``
    — not on how the rest of the corpus is distributed.

    Construction: ``bands`` independent bands of ``n_planes`` sign bits
    (one numpy matmul per Arrow batch computes all ``bands·n_planes``
    projections); a pair is a candidate iff it shares ANY (band,
    bucket) — a self equi-join on (band, bucket), never a cartesian.
    Exact cosine verification on candidates only, so there are NO
    false positives; the trade is DOCUMENTED recall:

        P(found | cos = t) = 1 − (1 − (1 − arccos(t)/π)^n_planes)^bands

    Defaults (12 planes × 16 bands): 0.9946 at t = 0.95, 0.9333 at
    t = 0.9 (the bound holds at the pair's ACTUAL cosine, so only
    pairs sitting exactly at the threshold see the worst case; the
    auto-route in :func:`embedding_near_duplicates_blocked` sizes
    ``bands`` up to keep the at-threshold bound ≥ 0.98) — and EXACT
    duplicates (cos = 1) are found with certainty:
    identical vectors share every band bucket deterministically, which
    is why the planted-duplicate oracle stays green through this route.
    Raise ``bands`` for borderline-pair recall; raise ``n_planes`` to
    shrink buckets (candidate volume) on larger corpora — bucket
    population ∝ n/2^n_planes per band, so candidate volume ∝
    bands·n²/2^(n_planes+1) on uniform data vs the n²/2 of brute force.

    Scale shape: the plan is one Arrow-batched projection pass, one
    explode (bands× row fan-out of (id, band, bucket) NARROW rows —
    never vectors), one shuffled self-join on (band, bucket), a
    distinct, and two hash joins back to the vectors for the verify.
    Skewed buckets (a dense angular region) are the hazard; AQE's skew
    handling applies to the candidate join, and raising ``n_planes``
    splits hot buckets geometrically."""
    import math

    head = df.select(vec_col).first()
    if head is None:
        # empty corpus: no pairs (same guard as the blocked sibling —
        # an upstream filter yielding zero rows is a valid empty
        # result, not a dims-probe crash)
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )
    dims = len(head[0])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((bands * n_planes, dims))

    n_pl, n_bd = n_planes, bands

    @F.pandas_udf("array<long>")
    def band_buckets(vec: pd.Series) -> pd.Series:
        V = np.stack(vec.to_numpy()).astype(np.float64)
        bits = (V @ planes.T) > 0  # one BLAS matmul per Arrow batch
        codes = (
            bits.reshape(len(V), n_bd, n_pl)
            * (1 << np.arange(n_pl, dtype=np.int64))
        ).sum(axis=2)
        return pd.Series(list(codes))

    base = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
    )
    exploded = base.select(
        "__id", F.posexplode(band_buckets("__vec")).alias("band", "bucket")
    )
    a = exploded.select(
        F.col("__id").alias("id_a"), "band", "bucket"
    )
    b = exploded.select(
        F.col("__id").alias("id_b"), "band", "bucket"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    if stats_out is not None:
        # diagnostics only (two extra counts — never on the hot path)
        cand = cand.localCheckpoint()
        n_rows = df.count()
        theta = math.acos(max(-1.0, min(1.0, threshold)))
        p_bit = 1.0 - theta / math.pi
        stats_out.update(
            {
                "n_rows": n_rows,
                "candidate_volume": cand.count(),
                "brute_force_volume": n_rows * (n_rows - 1) // 2,
                "n_planes": n_planes,
                "bands": bands,
                "threshold": threshold,
                "recall_lower_bound_at_threshold": round(
                    1.0 - (1.0 - p_bit**n_planes) ** bands, 6
                ),
                "route": "lsh",
            }
        )
    va = base.select(
        F.col("__id").alias("id_a"), F.col("__vec").alias("__vec_a")
    )
    vb = base.select(
        F.col("__id").alias("id_b"), F.col("__vec").alias("__vec_b")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine", cosine_col(F.col("__vec_a"), F.col("__vec_b"))
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def _ann_fit_encode_commit(
    corpus_n: DataFrame,
    index_path: str,
    dims: int,
    n_centroids: int,
    m_subspaces: int,
    ks_codes: int,
    seed: int,
) -> dict:
    """Shared fit→encode→commit tail of :func:`ann_index_build` and
    :func:`ann_index_refit`. ``corpus_n`` is (neighbor_id, c_vec) with
    c_vec already unit-normalized. Fits the coarse + PQ quantizers
    (distributed MLlib KMeans; driver holds centroids only), encodes
    every row, and commits COMPLETE new content: when the coded-vector
    table already exists, the commit is a replace over the UNION of old
    and new cell partitions — a refit reassigns cells wholesale, and a
    key-merging upsert would leave every cross-cell mover's stale row
    behind (the same hazard ADVICE r8 found on insert). Old versions
    stay time-travel readable, so a pinned query is never torn."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        _latest_manifest,
        manifest_replace_partitions,
        manifest_upsert_partitioned,
    )

    spark = corpus_n.sparkSession
    if dims % m_subspaces:
        raise ValueError(f"dims {dims} not divisible by m={m_subspaces}")
    d_sub = dims // m_subspaces

    corpus_f = corpus_n.withColumn("features", array_to_vector(F.col("c_vec")))
    coarse = KMeans(
        k=n_centroids, seed=seed, maxIter=10,
        featuresCol="features", predictionCol="cell",
    ).fit(corpus_f)
    assigned = coarse.transform(corpus_f).select("neighbor_id", "c_vec", "cell")

    sub_models = []
    for j in range(m_subspaces):
        sub_f = corpus_n.select(
            array_to_vector(
                F.slice(F.col("c_vec"), j * d_sub + 1, d_sub)
            ).alias("features")
        )
        sub_models.append(
            KMeans(
                k=ks_codes, seed=seed + j, maxIter=10,
                featuresCol="features", predictionCol=f"code_{j}",
            ).fit(sub_f)
        )

    enc = assigned
    for j, mdl in enumerate(sub_models):
        enc = mdl.transform(
            enc.withColumn(
                "features",
                array_to_vector(F.slice(F.col("c_vec"), j * d_sub + 1, d_sub)),
            )
        ).drop("features")
    coded = enc.select(
        "neighbor_id",
        "c_vec",
        F.array(*[F.col(f"code_{j}") for j in range(m_subspaces)]).alias(
            "codes"
        ),
        "cell",
    )
    vectors_path = f"{index_path}/vectors"
    v, content = _latest_manifest(vectors_path)
    # EPOCH pinning: vectors and meta are two tables, so a refit is two
    # commits and cannot be atomic across them. The fit stamps a fresh
    # epoch into BOTH — the vectors manifest (riding the data commit,
    # carried forward by insert/delete/compact commits) and the meta
    # params row — and ann_index_query refuses to mix them: a query
    # landing between the two commits (or after a crash between them)
    # resolves the newest vectors version whose epoch matches the meta
    # it read, so it serves the previous CONSISTENT index state instead
    # of decoding new codes against old codebooks.
    epoch = int(content.get("ann_epoch", 0)) + 1 if v > 0 else 1
    if v > 0:
        # full-content replace: old cells not re-staged must DROP (their
        # vectors re-assigned elsewhere or were deleted), so the wanted
        # set is old ∪ possible-new cells
        import json as _json

        old_cells = {
            int(_json.loads(k)[0]) if k.startswith("[") else int(k)
            for k in content.get("partitions", {})
        }
        wanted = sorted(old_cells | set(range(n_centroids)))
        manifest_replace_partitions(
            coded,
            vectors_path,
            "cell",
            wanted,
            extra_meta={"ann_epoch": epoch},
        )
    else:
        manifest_upsert_partitioned(
            coded,
            vectors_path,
            ["neighbor_id"],
            "cell",
            extra_meta={"ann_epoch": epoch},
        )

    meta_rows = [
        ("coarse", i, -1, -1, [float(x) for x in c])
        for i, c in enumerate(coarse.clusterCenters())
    ]
    meta_rows += [
        ("pq", -1, j, c, [float(x) for x in mdl.clusterCenters()[c]])
        for j, mdl in enumerate(sub_models)
        for c in range(ks_codes)
    ]
    meta_rows.append(
        (
            _ANN_PARAMS_KIND,
            -1,
            -1,
            -1,
            [
                float(dims),
                float(m_subspaces),
                float(ks_codes),
                float(n_centroids),
                float(epoch),  # pairs this codebook set with its codes
            ],
        )
    )
    meta = spark.createDataFrame(
        meta_rows,
        "kind STRING, cell INT, sub INT, code INT, centroid ARRAY<DOUBLE>",
    )
    meta_path = f"{index_path}/meta"
    mv, _ = _latest_manifest(meta_path)
    if mv > 0:
        # replace the whole kind partitions: a refit with a smaller k
        # must not leave the old codebook's tail rows live
        manifest_replace_partitions(
            meta.coalesce(1),
            meta_path,
            "kind",
            ["coarse", "pq", _ANN_PARAMS_KIND],
        )
    else:
        manifest_upsert_partitioned(
            meta.coalesce(1), meta_path, ["kind", "cell", "sub", "code"], "kind"
        )
    return {
        "dims": dims,
        "n_centroids": n_centroids,
        "m_subspaces": m_subspaces,
        "ks_codes": ks_codes,
    }


def ann_index_build(
    corpus: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m_subspaces: int = 8,
    ks_codes: int = 16,
    seed: int = 42,
) -> dict:
    """Fit the IVF-PQ quantizers and persist the index as manifest
    tables under ``index_path`` (see module comment for the layout).
    Returns build metrics. Rebuild = call again (same path is sound:
    the commit replaces the full cell content — no stale cross-cell
    rows — and old versions stay time-travel readable, so a query
    pinned to a version is never torn); to refit from the index's OWN
    stored vectors after insert/delete drift, use
    :func:`ann_index_refit`."""

    def normed(col):
        n = F.sqrt(
            F.aggregate(
                col,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        return F.transform(col, lambda x: x.cast("double") / n)

    corpus_n = corpus.select(
        F.col(id_col).alias("neighbor_id"), normed(F.col(vec_col)).alias("c_vec")
    )
    dims = len(corpus.select(vec_col).first()[0])
    return _ann_fit_encode_commit(
        corpus_n, index_path, dims, n_centroids, m_subspaces, ks_codes, seed
    )


def ann_index_refit(
    spark,
    index_path: str,
    n_centroids: int | None = None,
    m_subspaces: int | None = None,
    ks_codes: int | None = None,
    seed: int = 42,
) -> dict:
    """CODE-TABLE REFRESH after drift (VERDICT r8 "What's missing" #3's
    last edge): re-fit the coarse centroids and PQ codebooks from the
    index's OWN current live vectors — no external corpus argument —
    and re-encode every vector under the new quantizers. The input is
    the coded-vector table's stored unit vectors with pending deletes
    masked, so exactly the index's live population trains the new
    quantizers; parameters default to the stored build parameters.
    Run when :func:`ann_index_recall` telemetry dips after
    ``ann_index_insert`` batches drift from the build sample: recall
    for the drifted population recovers because the cells and codes
    now tile where the data actually lives. Commits are full-content
    partition replaces (never a key merge), so no stale row survives a
    wholesale cell reassignment; queries in flight keep reading their
    pinned version. Returns the new build metrics plus
    ``n_vectors``."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_read,
    )

    meta = manifest_read(spark, f"{index_path}/meta").collect()
    params = next(r for r in meta if r["kind"] == _ANN_PARAMS_KIND)["centroid"]
    dims = int(params[0])
    m_subspaces = int(params[1]) if m_subspaces is None else m_subspaces
    ks_codes = int(params[2]) if ks_codes is None else ks_codes
    n_centroids = int(params[3]) if n_centroids is None else n_centroids
    live = manifest_read(spark, f"{index_path}/vectors").select(
        "neighbor_id", "c_vec"
    )
    # the KMeans fits run several jobs over the live set — materialize
    # the (deletes-masked) read once instead of re-masking per job
    live = live.localCheckpoint()
    n_vectors = live.count()
    if n_vectors == 0:
        raise ValueError(
            f"ann_index_refit: index at {index_path} has no live vectors"
        )
    r = _ann_fit_encode_commit(
        live, index_path, dims, n_centroids, m_subspaces, ks_codes, seed
    )
    return {**r, "n_vectors": n_vectors}


def ann_index_refit_cells(
    spark,
    index_path: str,
    cells: "list[int] | None" = None,
    displacement_threshold: float = 0.05,
) -> dict:
    """CELL-LOCAL index maintenance (VERDICT r10 "Next round" #4): repair
    coarse-tiling drift by rewriting ONLY the drifted cells, never the
    corpus. At 100 TB a drift confined to churned cells must not pay a
    corpus-wide re-fit + re-encode — this is the scale-correct first
    response to a recall breach; :func:`ann_index_refit` remains the
    answer when the PQ codebooks themselves no longer fit the data.

    What it does (one constrained Lloyd step):

    1. DETECT: per-cell member mean vs the stored centroid — one
       column-pruned pass (cell, c_vec) with map-side partial
       aggregation into n_centroids×dims groups; driver state is
       bounded by the centroid table, never the corpus. A cell whose
       centroid displaced more than ``displacement_threshold`` (L2, on
       the unit sphere — converged-fit jitter is an order of magnitude
       below 0.05) is drifted. Pass ``cells`` explicitly to skip
       detection (e.g. cells named by insert-churn telemetry).
    2. RE-CENTER: each drifted cell's centroid moves to its current
       member mean (exactly the Lloyd update, restricted to drifted
       cells; empty cells keep their centroid).
    3. RE-ASSIGN: only the drifted cells' members are re-assigned to
       the nearest centroid of the UPDATED set (broadcast centroid
       join — cost ∝ drifted members × n_centroids). PQ codes do NOT
       change: this index PQ-encodes raw vector slices against GLOBAL
       codebooks, so a row's codes are assignment-independent and
       cross-cell movers carry them verbatim — zero re-encoding.
    4. REWRITE: one partition replace covering drifted ∪ receiving
       cells (movers' destinations carry their existing rows plus the
       movers) — rewrite cost ∝ affected cells' rows, not corpus — and
       one meta commit updating the coarse centroids + epoch. The same
       two-commit epoch protocol as a full refit: vectors first, then
       meta; :func:`ann_index_query` between the commits keeps serving
       the previous consistent epoch.

    Returns ``{"drifted_cells", "rewritten_cells", "n_rows_rewritten",
    "n_moved", "displacement"}``; detection finding nothing returns
    with empty lists and NO commit."""
    import numpy as np

    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        _latest_manifest,
        manifest_read,
        manifest_replace_partitions,
    )

    vectors_path = f"{index_path}/vectors"
    meta_path = f"{index_path}/meta"
    meta = manifest_read(spark, meta_path).collect()  # bounded: centroids
    params = list(
        next(r for r in meta if r["kind"] == _ANN_PARAMS_KIND)["centroid"]
    )
    coarse = {
        int(r["cell"]): np.asarray(r["centroid"], dtype=float)
        for r in meta
        if r["kind"] == "coarse"
    }
    live = manifest_read(spark, vectors_path).localCheckpoint()

    # per-cell member means — n_centroids×dims groups after map-side
    # combine; the collect is centroid-table-sized, never corpus-sized.
    # With EXPLICIT cells the pass is restricted to those cells'
    # partitions (the docstring's "skip detection" contract: a caller
    # who already named the churned cells must not pay a corpus-wide
    # aggregate for means it would discard — code-review r11)
    if cells is not None:
        drifted = sorted(int(c) for c in cells)
        unknown = [c for c in drifted if c not in coarse]
        if unknown:
            raise ValueError(
                f"ann_index_refit_cells: cells {unknown} are not in the "
                f"index's centroid table (have 0..{len(coarse) - 1})"
            )
        mean_src = live.filter(F.col("cell").isin(drifted))
    else:
        drifted = None
        mean_src = live
    mean_rows = (
        mean_src.select("cell", F.posexplode("c_vec").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    dims = max((r["pos"] for r in mean_rows), default=-1) + 1
    means: dict[int, np.ndarray] = {}
    for r in mean_rows:
        means.setdefault(int(r["cell"]), np.zeros(dims))[r["pos"]] = r["m"]
    displacement = {
        c: float(np.linalg.norm(coarse[c] - m))
        for c, m in means.items()
        if c in coarse
    }
    if drifted is None:
        drifted = sorted(
            c for c, d in displacement.items() if d > displacement_threshold
        )
    out = {
        "drifted_cells": drifted,
        "rewritten_cells": [],
        "n_rows_rewritten": 0,
        "n_moved": 0,
        "displacement": {c: round(d, 6) for c, d in displacement.items()},
    }
    if not drifted:
        return out

    new_cents = dict(coarse)
    for c in drifted:
        if c in means:  # an emptied cell keeps its centroid
            new_cents[c] = means[c]
    cent_df = spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in sorted(new_cents.items())],
        "cell INT, centroid ARRAY<DOUBLE>",
    )

    def l2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    w_cell = Window.partitionBy("neighbor_id").orderBy("d2", "cell")
    reassigned = (
        live.filter(F.col("cell").isin([int(c) for c in drifted]))
        .withColumnRenamed("cell", "old_cell")
        .join(F.broadcast(cent_df))
        .withColumn("d2", l2(F.col("c_vec"), F.col("centroid")))
        .withColumn("rk", F.row_number().over(w_cell))
        .filter(F.col("rk") == 1)
        .select("neighbor_id", "c_vec", "codes", "cell", "old_cell")
        .localCheckpoint()  # feeds the replace AND the mover counts
    )
    receiving = sorted(
        int(r["cell"])
        for r in reassigned.select("cell").distinct().collect()
    )  # bounded by n_centroids
    affected = sorted(set(drifted) | set(receiving))
    carried = live.filter(
        F.col("cell").isin([c for c in affected if c not in set(drifted)])
    ).select("neighbor_id", "c_vec", "codes", "cell")
    replacement = carried.unionByName(
        reassigned.select("neighbor_id", "c_vec", "codes", "cell")
    )

    v, content = _latest_manifest(vectors_path)
    epoch = int(content.get("ann_epoch", 0)) + 1
    r = manifest_replace_partitions(
        replacement,
        vectors_path,
        "cell",
        affected,
        extra_meta={"ann_epoch": epoch},
    )
    n_moved = reassigned.filter(F.col("cell") != F.col("old_cell")).count()
    n_rewritten = reassigned.count() + carried.count()

    # meta: updated coarse centroids + epoch-bumped params row; the pq
    # partition is untouched (codes did not change)
    if len(params) > 4:
        params[4] = float(epoch)
    else:
        params.append(float(epoch))
    meta_rows = [
        ("coarse", c, -1, -1, [float(x) for x in cent])
        for c, cent in sorted(new_cents.items())
    ]
    meta_rows.append((_ANN_PARAMS_KIND, -1, -1, -1, params))
    meta_new = spark.createDataFrame(
        meta_rows,
        "kind STRING, cell INT, sub INT, code INT, centroid ARRAY<DOUBLE>",
    )
    manifest_replace_partitions(
        meta_new.coalesce(1), meta_path, "kind", ["coarse", _ANN_PARAMS_KIND]
    )
    out.update(
        rewritten_cells=affected,
        n_rows_rewritten=n_rewritten,
        n_moved=n_moved,
        partitions_written=r.get("partitions_written"),
    )
    return out


def ann_index_query(
    queries: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
    refine_factor: int = 4,
) -> DataFrame:
    """Answer a query batch against a PERSISTED IVF-PQ index — no
    quantizer refit, no corpus argument: the index tables under
    ``index_path`` carry everything. Plan shape: broadcast coarse
    centroids rank each query's ``n_probe`` cells; the coded-vector
    read PARTITION-PRUNES to exactly those cells (manifest metadata,
    zero listing); ADC scores candidates through a broadcast per-query
    lookup table; the shortlist exactly re-ranks on the stored unit
    vectors. Driver state: the meta table collect —
    n_centroids + m·ks rows, bounded by build parameters, never by
    corpus size."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_read,
    )

    spark = queries.sparkSession
    meta = manifest_read(spark, f"{index_path}/meta").collect()
    params = next(
        r for r in meta if r["kind"] == _ANN_PARAMS_KIND
    )["centroid"]
    dims, m_subspaces, ks_codes = int(params[0]), int(params[1]), int(params[2])
    d_sub = dims // m_subspaces
    coarse_cents = [
        (r["cell"], r["centroid"]) for r in meta if r["kind"] == "coarse"
    ]
    pq_cents = [
        (r["sub"], r["code"], r["centroid"])
        for r in meta
        if r["kind"] == "pq"
    ]

    def normed(col):
        n = F.sqrt(
            F.aggregate(
                col,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        return F.transform(col, lambda x: x.cast("double") / n)

    queries_n = queries.select(
        F.col(id_col).alias("query_id"), normed(F.col(vec_col)).alias("q_vec")
    )

    cent_df = spark.createDataFrame(
        coarse_cents, "cell INT, centroid ARRAY<DOUBLE>"
    )
    q_cells = (
        queries_n.join(F.broadcast(cent_df))
        .withColumn(
            "dist",
            F.aggregate(
                F.zip_with(
                    F.col("q_vec"), F.col("centroid"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("dist", "cell")
            ),
        )
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "cell")
    )
    # bounded plan-time collect: ≤ n_centroids distinct cells (a build
    # parameter), independent of corpus and query-batch size
    probed = sorted(
        r["cell"] for r in q_cells.select("cell").distinct().collect()
    )
    # EPOCH consistency (see _ann_fit_encode_commit): never decode a
    # vectors version's codes with a DIFFERENT fit's codebooks. The
    # common path is one head compare; the walk-back only runs in the
    # window between a refit's two commits (or after a crash there),
    # where it serves the previous consistent index state.
    meta_epoch = int(params[4]) if len(params) > 4 else None
    pin_version = None
    if meta_epoch is not None:
        from data_management_service_run_etl_imputations_spark.sources.sinks import (
            _latest_version,
            _materialize,
            _pruned_resolve,
        )

        head_v = _latest_version(f"{index_path}/vectors")
        # meta-only resolve when the chain anchors at a checkpoint —
        # the epoch compare must not hydrate the O(files) driver dict
        # the partition-pruned vector read below avoids. The fallback
        # materializes head_v ITSELF (never a re-resolved "latest"):
        # a refit committing between the two lookups must not make
        # head_c newer than head_v, or the walk-back below would skip
        # the newest epoch-consistent version.
        if head_v > 0:
            resolved = _pruned_resolve(f"{index_path}/vectors", head_v)
            head_c = (
                resolved[0]
                if resolved is not None
                else _materialize(f"{index_path}/vectors", head_v)
            )
            head_e = head_c.get("ann_epoch")
        else:  # no vectors table: the read below raises its own error
            head_e = None
        if head_e is not None and int(head_e) == meta_epoch:
            # Pin the read to the VERIFIED head: a refit committing
            # between this epoch check and the manifest_read below would
            # otherwise let the (unpinned) read resolve a NEWER vectors
            # version and decode new-epoch codes with the old codebooks
            # — the exact torn-state mix the walk-back path guards
            # against, reopened on the match path (ADVICE r9 medium).
            pin_version = head_v
        if head_e is not None and int(head_e) != meta_epoch:
            if int(head_e) < meta_epoch:
                raise RuntimeError(
                    f"ANN index at {index_path} is torn the wrong way: "
                    f"meta epoch {meta_epoch} > vectors epoch {head_e} "
                    "(a one-sided restore?) — re-run ann_index_refit "
                    "or restore both tables to a matching pair"
                )
            v = head_v - 1
            while v >= 1:
                e = _materialize(f"{index_path}/vectors", v).get(
                    "ann_epoch"
                )
                if e is None or int(e) == meta_epoch:
                    break
                v -= 1
            if v < 1:
                raise RuntimeError(
                    f"ANN index at {index_path}: no vectors version "
                    f"matches meta epoch {meta_epoch} (vacuumed?) — "
                    "re-run ann_index_refit"
                )
            pin_version = v
    vectors = manifest_read(
        spark,
        f"{index_path}/vectors",
        partition_filter={"cell": probed},
        version=pin_version,
    )
    codes_long = vectors.select(
        "neighbor_id",
        "cell",
        F.posexplode(F.col("codes")).alias("sub", "code"),
    )

    cent_pq = spark.createDataFrame(
        pq_cents, "sub INT, code INT, centroid ARRAY<DOUBLE>"
    )
    lut = (
        queries_n.join(F.broadcast(cent_pq))
        .select(
            "query_id", "sub", "code",
            F.aggregate(
                F.zip_with(
                    F.slice(F.col("q_vec"), F.col("sub") * d_sub + 1, d_sub),
                    F.col("centroid"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )

    adc = (
        F.broadcast(q_cells)
        .join(codes_long, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    w_adc = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    shortlist = (
        adc.withColumn("srk", F.row_number().over(w_adc))
        .filter(F.col("srk") <= k * refine_factor)
        .select("query_id", "neighbor_id")
    )

    rescored = (
        shortlist.join(queries_n.withColumnRenamed("q_vec", "qv"), "query_id")
        .join(
            vectors.select("neighbor_id", F.col("c_vec").alias("cv")),
            "neighbor_id",
        )
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


def ann_index_insert(
    new_vectors: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """INCREMENTAL index maintenance: encode new vectors with the
    EXISTING quantizers (no refit — FAISS's ``add`` after ``train``) and
    upsert them into the coded-vector table; re-sent ids replace their
    old codes EVERYWHERE — a delete-first key-probed MERGE removes the
    old row even when the updated vector assigns to a DIFFERENT coarse
    cell (a cell-partitioned upsert alone only merges within touched
    cells, so a cross-cell mover would leave a stale duplicate
    neighbor_id behind; ADVICE r8). The quantizers deliberately
    stay fixed: recall for the new vectors degrades only as the data
    distribution drifts from the build sample, which is the documented
    rebuild trigger (build a fresh index and swap paths), never a
    silent one. Cost: one broadcast-centroid assignment pass over the
    NEW vectors + one partition-level upsert into the touched cells —
    independent of index size."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_merge,
        manifest_read,
        manifest_upsert_partitioned,
    )

    spark = new_vectors.sparkSession
    meta = manifest_read(spark, f"{index_path}/meta").collect()
    params = next(
        r for r in meta if r["kind"] == _ANN_PARAMS_KIND
    )["centroid"]
    dims, m_subspaces = int(params[0]), int(params[1])
    d_sub = dims // m_subspaces
    coarse_cents = [
        (r["cell"], r["centroid"]) for r in meta if r["kind"] == "coarse"
    ]
    pq_cents = [
        (r["sub"], r["code"], r["centroid"])
        for r in meta
        if r["kind"] == "pq"
    ]

    def normed(col):
        n = F.sqrt(
            F.aggregate(
                col,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        return F.transform(col, lambda x: x.cast("double") / n)

    vecs = new_vectors.select(
        F.col(id_col).alias("neighbor_id"), normed(F.col(vec_col)).alias("c_vec")
    )

    def l2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # nearest coarse cell per vector (broadcast centroid table)
    cent_df = spark.createDataFrame(
        coarse_cents, "cell INT, centroid ARRAY<DOUBLE>"
    )
    w_cell = Window.partitionBy("neighbor_id").orderBy("d2", "cell")
    assigned = (
        vecs.join(F.broadcast(cent_df))
        .withColumn("d2", l2(F.col("c_vec"), F.col("centroid")))
        .withColumn("rk", F.row_number().over(w_cell))
        .filter(F.col("rk") == 1)
        .select("neighbor_id", "c_vec", "cell")
    )
    # nearest PQ code per subspace (broadcast codebook)
    cb = spark.createDataFrame(
        pq_cents, "sub INT, code INT, centroid ARRAY<DOUBLE>"
    )
    w_code = Window.partitionBy("neighbor_id", "sub").orderBy("d2", "code")
    codes = (
        assigned.join(F.broadcast(cb))
        .withColumn(
            "d2",
            l2(
                F.slice(F.col("c_vec"), F.col("sub") * d_sub + 1, d_sub),
                F.col("centroid"),
            ),
        )
        .withColumn("rk", F.row_number().over(w_code))
        .filter(F.col("rk") == 1)
        .groupBy("neighbor_id")
        .agg(
            F.first("c_vec").alias("c_vec"),
            F.first("cell").alias("cell"),
            F.array_sort(
                F.collect_list(F.struct("sub", "code"))
            ).alias("__sc"),
        )
        .select(
            "neighbor_id",
            "c_vec",
            F.transform(F.col("__sc"), lambda s: s["code"]).alias("codes"),
            "cell",
        )
    )
    codes = codes.localCheckpoint()  # evaluated once, reused twice
    # DELETE-FIRST across ALL cells (manifest_apply_cdf_batch's
    # pattern): the key-probed MERGE removes a re-sent id's old row
    # wherever it lives — including a different cell than the updated
    # vector now assigns to. The probe is index-pruned; a batch of
    # genuinely-new ids matches no files and rewrites nothing.
    d = manifest_merge(
        codes,
        f"{index_path}/vectors",
        ["neighbor_id"],
        "cell",
        matched_delete="true",
        insert_not_matched=False,
    )
    replaced = d.get("deleted", 0)
    # stamp the epoch of the META this batch was ENCODED with: if a
    # concurrent refit replaced the table between our meta read and
    # this commit, the epoch regresses and ann_index_query refuses
    # loudly instead of silently mixing old-fit codes into a new-fit
    # index (legacy pre-epoch indexes carry no stamp)
    ins_meta = (
        {"ann_epoch": int(params[4])} if len(params) > 4 else None
    )
    r = manifest_upsert_partitioned(
        codes,
        f"{index_path}/vectors",
        ["neighbor_id"],
        "cell",
        extra_meta=ins_meta,
    )
    # after the delete pass every batch row inserts fresh; "replaced"
    # reports how many of those superseded a pre-existing id
    total = r.get("inserted", 0) + r.get("updated", 0)
    return {
        "inserted": max(0, total - replaced),
        "replaced": replaced,
    }


def ann_index_delete(
    spark,
    index_path: str,
    ids,
    id_col: str = "vec_id",
) -> dict:
    """Remove vectors from a PERSISTED index WITHOUT rebuild or rewrite
    (VERDICT r8 "Next round" #3): an equality merge-on-read delete on
    the coded-vector manifest table masks the rows at read time —
    FAISS's ``remove_ids``, expressed as the table protocol's own MoR
    delete. Zero data movement at delete time; every read path
    (``ann_index_query``'s partition-pruned cell read included) goes
    through ``manifest_read``, which applies pending delete entries, so
    a deleted neighbor can never surface — not even as an ADC
    candidate. The mask materializes physically at the next natural
    rewrite of the touched cells (an ``ann_index_insert`` upsert or
    ``manifest_compact``), at which point the entry purges itself.
    ``ids``: an iterable of vector ids, or a DataFrame whose first (or
    ``id_col``) column holds them. Returns ``{"deleted_keys": n}``."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_delete,
    )

    if isinstance(ids, DataFrame):
        col = id_col if id_col in ids.columns else ids.columns[0]
        keys = ids.select(F.col(col).alias("neighbor_id"))
    else:
        keys = spark.createDataFrame(
            [(int(i),) for i in ids], "neighbor_id LONG"
        )
    r = manifest_delete(keys, f"{index_path}/vectors", ["neighbor_id"])
    return {"deleted_keys": r.get("keys", 0)}


def ann_index_recall(
    queries: DataFrame,
    index_path: str,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
    refine_factor: int = 4,
) -> DataFrame:
    """Recall@k of the persisted index against the EXACT brute-force
    top-k over ``corpus`` — the drift telemetry a long-lived index
    needs: the quantizers are frozen at build time, so recall decays
    silently as ``ann_index_insert`` batches drift from the build
    sample (and improves as deletes prune). Run this on a query sample
    after each maintenance window; a dip below the SLA is the rebuild
    trigger. Cost: one index query + one brute-force pass over the
    query SAMPLE (not the corpus per corpus row — the broadcast side is
    the sample). Returns (query_id, n_hits, n_exact, recall)."""
    approx = ann_index_query(
        queries, index_path, id_col, vec_col, k, n_probe, refine_factor
    )
    exact = brute_force_topk(
        corpus, queries, id_col=id_col, vec_col=vec_col, k=k
    )
    hits = (
        approx.select("query_id", "neighbor_id")
        .join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    denom = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return (
        denom.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            "n_exact",
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0))
                / F.col("n_exact"),
                6,
            ).alias("recall"),
        )
    )


def ann_index_maintain(
    spark,
    index_path: str,
    recall_bound: float = 0.8,
    probe_sample: int = 32,
    k: int = 10,
    n_probe: int = 4,
    refine_factor: int = 4,
    seed: int = 42,
    strategy: str = "auto",
    displacement_threshold: float = 0.05,
) -> dict:
    """AUTO-REFIT policy closing the telemetry loop (VERDICT r9 "Next
    round" #7): measure recall@k on a probe sample drawn from the
    index's OWN live vectors, and trigger ONE :func:`ann_index_refit`
    only when the measured mean recall falls below ``recall_bound``.
    The maintenance entry point a scheduler calls after insert/delete
    churn windows — no external corpus argument, no unconditional
    refit cost.

    Probe construction: the ``probe_sample`` live vectors with the
    lowest ``xxhash64(neighbor_id, seed)`` — deterministic for a given
    population (re-runs measure the same probe unless the population
    changed), uniformly spread over ids, and bounded driver state
    (``probe_sample`` rows). Ground truth is the exact brute-force
    top-k over the live vectors themselves, so the recall measured is
    exactly what :func:`ann_index_recall` would report with the index's
    population as the corpus.

    Repair strategy (r10 "Next round" #4): ``"auto"`` (default) answers
    a breach with the CELL-LOCAL rewrite first
    (:func:`ann_index_refit_cells` — drift detection, re-center,
    re-assign, rewrite ∝ drifted cells) and escalates to at most ONE
    full :func:`ann_index_refit` only if recall is still below the
    bound (codebook-level drift) or nothing was detected as drifted;
    ``"cell_local"`` never escalates (the caller owns the fallback);
    ``"full"`` is the corpus-wide refit directly.

    Returns ``{"recall": mean, "n_probes": n, "refit": bool,
    "recall_after": mean-or-None}`` — ``recall_after`` is re-measured
    on the SAME probe ids after a triggered refit, making the
    improvement (or a genuine data pathology) visible to the caller;
    plus ``refit_strategy`` ('cell_local'|'full') and ``cell_refit``
    telemetry when a breach was handled."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_read,
    )

    live = (
        manifest_read(spark, f"{index_path}/vectors")
        .select("neighbor_id", "c_vec")
        .localCheckpoint()
    )
    probes = (
        live.withColumn(
            "__h", F.xxhash64(F.col("neighbor_id"), F.lit(seed))
        )
        .orderBy("__h")
        .limit(probe_sample)
        .select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("c_vec").alias("embedding"),
        )
        .localCheckpoint()
    )
    corpus = live.select(
        F.col("neighbor_id").alias("vec_id"),
        F.col("c_vec").alias("embedding"),
    )

    def _measure() -> "tuple[float | None, int]":
        r = ann_index_recall(
            probes,
            index_path,
            corpus,
            k=k,
            n_probe=n_probe,
            refine_factor=refine_factor,
        ).agg(
            F.avg("recall").alias("m"), F.count(F.lit(1)).alias("n")
        ).first()
        return (
            float(r["m"]) if r["m"] is not None else None,
            int(r["n"]),
        )

    recall, n_probes = _measure()
    if n_probes == 0 or recall is None:
        # an empty vectors table (or an empty probe sample) is a
        # DISTINCT outcome, not health: defaulting the null mean to 1.0
        # let a hollowed-out index pass maintenance silently (ADVICE
        # r10 low). No refit either — there is nothing to fit.
        return {
            "recall": None,
            "n_probes": n_probes,
            "refit": False,
            "recall_after": None,
        }
    out = {
        "recall": round(recall, 6),
        "n_probes": n_probes,
        "refit": False,
        "recall_after": None,
    }
    if strategy not in ("auto", "cell_local", "full"):
        raise ValueError(
            f"strategy must be auto|cell_local|full, got {strategy!r}"
        )
    if recall < recall_bound:
        # escalation ladder (r10 "Next round" #4): the cell-scoped
        # rewrite first — cost ∝ drifted cells, the scale-correct
        # response at 100 TB — then AT MOST ONE full refit when the
        # breach is codebook-level (or strategy='full' was forced).
        # 'cell_local' never escalates: the caller owns the fallback.
        if strategy in ("auto", "cell_local"):
            cr = ann_index_refit_cells(
                spark,
                index_path,
                displacement_threshold=displacement_threshold,
            )
            out["cell_refit"] = {
                kk: cr[kk]
                for kk in ("drifted_cells", "rewritten_cells", "n_moved",
                           "n_rows_rewritten")
            }
            if cr["rewritten_cells"]:
                after, _ = _measure()
                out.update(
                    refit=True,
                    refit_strategy="cell_local",
                    recall_after=round(after, 6),
                )
                if after >= recall_bound or strategy == "cell_local":
                    return out
            elif strategy == "cell_local":
                return out  # nothing drifted: measurement only
        refit = ann_index_refit(spark, index_path, seed=seed)
        after, _ = _measure()
        out.update(
            refit=True,
            refit_strategy="full",
            recall_after=round(after, 6),
            n_vectors=refit["n_vectors"],
        )
    return out
