"""Persisted IVF-PQ index: build-once/query-many as separate jobs over
manifest tables — layout, recall vs brute force, reuse without refit,
partition-pruned cell reads, and restart-safety (the index is plain
manifest state on disk; a reader needs no build-time objects).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.similarity import (
    ann_index_build,
    ann_index_query,
    brute_force_topk,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    manifest_read,
)

SF_DIR = "/root/testdata/sf0.001"


# r13 driver-window tier: this file is in the SLOW families (measured
# from the full-suite durations log); deselect with -m "not slow".
pytestmark = pytest.mark.slow


@pytest.fixture()
def index_root():
    root = f"{tempfile.gettempdir()}/annp_{uuid.uuid4().hex[:10]}"
    yield root
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _recall(approx, exact):
    hits = approx.select("query_id", "neighbor_id").join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    return hits.count() / exact.count()


def test_build_writes_manifest_layout(spark, emb, index_root):
    info = ann_index_build(
        emb, index_root, n_centroids=8, m_subspaces=8, ks_codes=16
    )
    assert info["n_centroids"] == 8
    vec = manifest_read(spark, index_root + "/vectors")
    assert set(vec.columns) >= {"neighbor_id", "c_vec", "codes", "cell"}
    assert vec.count() == emb.count()
    meta = manifest_read(spark, index_root + "/meta")
    kinds = {r["kind"] for r in meta.select("kind").distinct().collect()}
    assert kinds == {"coarse", "pq", "params"}
    # every vector has m codes in [0, ks)
    bad = vec.filter(
        (F.size("codes") != 8)
        | F.exists("codes", lambda c: (c < 0) | (c >= 16))
    ).count()
    assert bad == 0


def test_query_recall_and_reuse_without_refit(spark, emb, index_root):
    ann_index_build(
        emb, index_root, n_centroids=16, m_subspaces=8, ks_codes=32
    )
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=10)
    a1 = ann_index_query(queries, index_root, k=10, n_probe=12,
                         refine_factor=12)
    assert _recall(a1, exact) >= 0.6
    # second batch, same index, different queries — no corpus, no refit
    q2 = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 8))
    e2 = brute_force_topk(emb, q2, k=10)
    a2 = ann_index_query(q2, index_root, k=10, n_probe=12,
                         refine_factor=12)
    assert _recall(a2, e2) >= 0.6
    # determinism: same batch twice → identical rows
    b1 = sorted(map(tuple, a1.collect()))
    b2 = sorted(map(tuple, ann_index_query(
        queries, index_root, k=10, n_probe=12, refine_factor=12
    ).collect()))
    assert b1 == b2


def test_probe_reads_only_probed_cells(spark, emb, index_root):
    """The coded-vector read must partition-prune: with n_probe=1 and a
    single query, only that query's nearest cell is read."""
    ann_index_build(
        emb, index_root, n_centroids=8, m_subspaces=8, ks_codes=16
    )
    q = emb.filter(F.col("vec_id") == 0)
    out = ann_index_query(q, index_root, k=5, n_probe=1, refine_factor=4)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    # every neighbor must come from ONE cell (the probed one)
    vec = manifest_read(spark, index_root + "/vectors")
    cells = (
        vec.join(
            out.select(F.col("neighbor_id")), "neighbor_id", "left_semi"
        )
        .select("cell")
        .distinct()
        .collect()
    )
    assert len(cells) == 1


def test_incremental_insert_without_refit(spark, emb, index_root):
    """ann_index_insert encodes NEW vectors with the existing quantizers
    and upserts them into the coded-vector table: planted exact copies
    of the query vectors must come back as rank-1 neighbors at cosine
    1.0, and the meta table (quantizers) must be untouched."""
    from data_management_service_run_etl_imputations_spark.operators.similarity import (
        ann_index_insert,
    )
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_history,
    )

    ann_index_build(
        emb, index_root, n_centroids=16, m_subspaces=8, ks_codes=32
    )
    meta_hist_before = len(manifest_history(index_root + "/meta"))
    queries = emb.filter(F.col("vec_id") < 3)
    planted = queries.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    r = ann_index_insert(planted, index_root)
    assert r["inserted"] == 3 and r["replaced"] == 0
    assert len(manifest_history(index_root + "/meta")) == meta_hist_before
    vec = manifest_read(spark, index_root + "/vectors")
    assert vec.count() == emb.count() + 3
    out = ann_index_query(
        queries, index_root, k=5, n_probe=12, refine_factor=12
    )
    top1 = {
        r["query_id"]: (r["neighbor_id"], r["cosine"])
        for r in out.filter(F.col("rank") == 1).collect()
    }
    for qid, (nid, cos) in top1.items():
        assert nid == qid + 100000
        assert cos == pytest.approx(1.0, abs=1e-6)
    # re-sent ids REPLACE their codes (upsert semantics), never duplicate
    ann_index_insert(planted, index_root)
    assert manifest_read(spark, index_root + "/vectors").count() == (
        emb.count() + 3
    )


def test_insert_resend_moves_cell_without_stale_duplicate(
    spark, emb, index_root
):
    """ADVICE r8 (medium): a re-sent vec_id whose UPDATED vector assigns
    to a DIFFERENT coarse cell must REPLACE its old row, not leave a
    stale duplicate in the old cell — the cell-partitioned upsert alone
    only merges within touched partitions, so the delete-first MERGE is
    what makes this hold. Pins: exactly one row per id, row in the NEW
    cell, and the query returns the id once (no torn ADC sums)."""
    from data_management_service_run_etl_imputations_spark.operators.similarity import (
        ann_index_insert,
    )

    ann_index_build(
        emb, index_root, n_centroids=16, m_subspaces=8, ks_codes=32
    )
    vec = manifest_read(spark, index_root + "/vectors")
    # two source vectors that the index assigns to DIFFERENT cells
    cells = {
        r["neighbor_id"]: r["cell"]
        for r in vec.filter(F.col("neighbor_id") < 50).collect()
    }
    ids = sorted(cells)
    a = ids[0]
    b = next(i for i in ids if cells[i] != cells[a])
    emb_of = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id").isin([a, b])).collect()
    }
    planted_id = 777777
    schema = "vec_id LONG, embedding ARRAY<FLOAT>"
    r1 = ann_index_insert(
        spark.createDataFrame([(planted_id, emb_of[a])], schema), index_root
    )
    assert r1 == {"inserted": 1, "replaced": 0}
    before = manifest_read(spark, index_root + "/vectors")
    row1 = before.filter(F.col("neighbor_id") == planted_id).collect()
    assert len(row1) == 1 and row1[0]["cell"] == cells[a]
    # re-send the SAME id with b's vector — lands in a different cell
    r2 = ann_index_insert(
        spark.createDataFrame([(planted_id, emb_of[b])], schema), index_root
    )
    assert r2 == {"inserted": 0, "replaced": 1}
    after = manifest_read(spark, index_root + "/vectors")
    rows = after.filter(F.col("neighbor_id") == planted_id).collect()
    assert len(rows) == 1, "stale old-cell row survived the re-send"
    assert rows[0]["cell"] == cells[b]
    assert after.count() == emb.count() + 1
    # the query never sees the neighbor twice
    q = emb.filter(F.col("vec_id") == b).select("vec_id", "embedding")
    out = ann_index_query(q, index_root, k=5, n_probe=12, refine_factor=12)
    mine = out.filter(F.col("neighbor_id") == planted_id).collect()
    assert len(mine) == 1
    assert mine[0]["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_index_delete_roundtrip_and_reinsert(spark, emb, index_root):
    """ann_index_delete masks vectors via the table's MoR equality
    delete (zero rewrite): a deleted planted id disappears from the
    vectors read AND from query results immediately; re-inserting the
    same id afterwards resurrects it cleanly (the insert's delete-first
    merge + upsert rewrite purges the pending mask for that key)."""
    from data_management_service_run_etl_imputations_spark.operators.similarity import (
        ann_index_delete,
        ann_index_insert,
    )
    from data_management_service_run_etl_imputations_spark.operators.similarity import (
        ann_index_recall as recall_fn,
    )

    ann_index_build(
        emb, index_root, n_centroids=16, m_subspaces=8, ks_codes=32
    )
    queries = emb.filter(F.col("vec_id") < 3)
    planted = queries.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    ann_index_insert(planted, index_root)
    r = ann_index_delete(spark, index_root, [100000, 100001])
    assert r == {"deleted_keys": 2}
    vec = manifest_read(spark, index_root + "/vectors")
    assert vec.count() == emb.count() + 1  # masked at read time
    out = ann_index_query(
        queries, index_root, k=5, n_probe=12, refine_factor=12
    )
    got_ids = {r["neighbor_id"] for r in out.collect()}
    assert 100000 not in got_ids and 100001 not in got_ids
    assert 100002 in got_ids  # the surviving planted copy still rank-1
    # recall telemetry against the live corpus (emb + survivor)
    live = emb.select("vec_id", "embedding").unionByName(
        planted.filter(F.col("vec_id") == 100002)
    )
    rec = recall_fn(
        queries, index_root, live, k=5, n_probe=12, refine_factor=12
    )
    rows = {r["query_id"]: r["recall"] for r in rec.collect()}
    assert len(rows) == 3 and all(v >= 0.6 for v in rows.values())
    # re-insert a deleted id: it must come back exactly once
    ann_index_insert(
        planted.filter(F.col("vec_id") == 100000), index_root
    )
    vec2 = manifest_read(spark, index_root + "/vectors")
    assert vec2.filter(F.col("neighbor_id") == 100000).count() == 1
    out2 = ann_index_query(
        queries.filter(F.col("vec_id") == 0),
        index_root, k=5, n_probe=12, refine_factor=12,
    )
    assert 100000 in {r["neighbor_id"] for r in out2.collect()}


def test_refit_from_own_vectors_after_drift(spark, emb, index_root):
    from data_management_service_run_etl_imputations_spark.operators.similarity import (
        ann_index_delete,
        ann_index_insert,
        ann_index_refit,
    )

    ann_index_build(
        emb, index_root, n_centroids=8, m_subspaces=8, ks_codes=16
    )
    n0 = emb.count()
    # drift: insert a shifted population and delete a few originals
    shifted = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(3.0)).alias(
            "embedding"
        ),
    ).limit(50)
    ann_index_insert(shifted, index_root)
    ann_index_delete(spark, index_root, [0, 1, 2])
    r = ann_index_refit(spark, index_root)
    assert r["n_vectors"] == n0 + 50 - 3
    vec = manifest_read(spark, index_root + "/vectors")
    # full-content replace: every live id exactly once, deleted ids gone
    assert vec.count() == n0 + 50 - 3
    assert (
        vec.groupBy("neighbor_id").count().filter("count > 1").count() == 0
    )
    assert vec.filter(F.col("neighbor_id").isin([0, 1, 2])).count() == 0
    # parameters preserved by default and the index still answers
    meta = manifest_read(spark, index_root + "/meta")
    params = meta.filter("kind = 'params'").collect()[0]["centroid"]
    assert int(params[3]) == 8
    # query ids NOT in the index (self-matches are excluded by design)
    # carrying vec 10/11's embeddings: probing every cell with a wide
    # re-rank shortlist must surface the exact-match stored rows
    q = emb.filter("vec_id IN (10, 11)").select(
        (F.col("vec_id") + 900000).alias("vec_id"), "embedding"
    )
    got = ann_index_query(q, index_root, k=5, n_probe=8, refine_factor=16)
    assert got.filter("query_id = 900010 AND neighbor_id = 10").count() == 1


def test_same_path_rebuild_leaves_no_stale_rows(spark, emb, index_root):
    ann_index_build(
        emb, index_root, n_centroids=8, m_subspaces=8, ks_codes=16
    )
    # second build on the SAME path with different cell geometry — a
    # key-merging commit would leave cross-cell movers duplicated
    ann_index_build(
        emb, index_root, n_centroids=4, m_subspaces=8, ks_codes=16, seed=7
    )
    vec = manifest_read(spark, index_root + "/vectors")
    assert vec.count() == emb.count()
    assert (
        vec.groupBy("neighbor_id").count().filter("count > 1").count() == 0
    )
    assert vec.select("cell").distinct().count() <= 4


def test_query_never_mixes_codes_with_wrong_codebooks(spark, emb, index_root):
    """A refit is two commits (vectors, then meta). A reader landing
    between them — simulated by restoring the META table to the
    pre-refit fit — must serve the PREVIOUS consistent index pair, not
    decode new codes against old codebooks."""
    from data_management_service_run_etl_imputations_spark.operators.similarity import (
        ann_index_refit,
    )
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        _latest_manifest,
        manifest_history,
        manifest_restore,
    )

    ann_index_build(
        emb, index_root, n_centroids=8, m_subspaces=8, ks_codes=16
    )
    q = emb.filter("vec_id IN (10, 11)").select(
        (F.col("vec_id") + 900000).alias("vec_id"), "embedding"
    )

    def rows():
        return sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in ann_index_query(
                q, index_root, k=5, n_probe=8, refine_factor=16
            ).collect()
        )

    before = rows()
    meta_v0 = manifest_history(f"{index_root}/meta")[-1]["version"]
    ann_index_refit(spark, index_root, seed=9)
    _, vec_head = _latest_manifest(f"{index_root}/vectors")
    assert int(vec_head["ann_epoch"]) == 2
    # meta rolled back to epoch 1 while vectors head is epoch 2: the
    # torn window. The query must walk back to the epoch-1 vectors.
    manifest_restore(f"{index_root}/meta", version=meta_v0)
    assert rows() == before
