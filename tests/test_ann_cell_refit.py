"""Cell-local ANN refit (VERDICT r10 "Next round" #4): a recall breach
confined to churned cells is repaired by re-centering + re-assigning
ONLY the drifted cells' members — rewrite cost ∝ drifted cells, never
the corpus — with the full corpus-wide refit reserved for
codebook-level drift (the 'auto' escalation ladder).
"""

from __future__ import annotations

import random
import shutil
import tempfile
import uuid

import pytest

from data_management_service_run_etl_imputations_spark.operators.similarity import (
    ann_index_build,
    ann_index_insert,
    ann_index_maintain,
    ann_index_recall,
    ann_index_refit_cells,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    manifest_history,
    manifest_read,
)


# r13 driver-window tier: this file is in the SLOW families (measured
# from the full-suite durations log); deselect with -m "not slow".
pytestmark = pytest.mark.slow


@pytest.fixture()
def index_root():
    root = f"{tempfile.gettempdir()}/annc_{uuid.uuid4().hex[:10]}"
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _clusters(spark, cluster_ids, per=60, dims=32, seed=7, sigma=0.05,
              shift=0.0):
    """Seeded Gaussian clusters (same geometry as test_ann_maintain);
    ``shift`` displaces every member along dimension 0 — the controlled
    drift knob."""
    rng = random.Random(seed)
    centers = {c: [rng.gauss(0, 1) for _ in range(16)] for c in range(16)}
    rows = []
    for c in cluster_ids:
        rngc = random.Random(seed * 7919 + c)
        full = centers[c] + [rngc.gauss(0, 1) for _ in range(dims - 16)]
        for i in range(per):
            vid = c * 10000 + i
            rng2 = random.Random(seed * 100003 + vid)
            vec = [x + rng2.gauss(0, sigma) for x in full]
            vec[0] += shift
            rows.append((vid, vec))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_no_drift_is_noop(spark, index_root):
    """A healthy index: detection finds nothing, NO commit lands."""
    ann_index_build(
        _clusters(spark, range(4)), index_root,
        n_centroids=8, m_subspaces=8, ks_codes=16,
    )
    v_before = manifest_history(f"{index_root}/vectors")[-1]["version"]
    r = ann_index_refit_cells(spark, index_root)
    assert r["drifted_cells"] == []
    assert r["rewritten_cells"] == []
    assert r["n_rows_rewritten"] == 0
    assert (
        manifest_history(f"{index_root}/vectors")[-1]["version"] == v_before
    )


def test_cell_local_rewrite_is_subset_and_repairs(spark, index_root):
    """Concentrated churn: a new population lands in (and stretches) a
    subset of cells. The cell-local pass must (a) rewrite a PROPER
    subset of cells and rows, (b) keep every id exactly once, (c) not
    regress measured recall, and (d) leave the index epoch-consistent
    for queries."""
    base = _clusters(spark, range(4))
    ann_index_build(
        base, index_root, n_centroids=8, m_subspaces=8, ks_codes=16,
    )
    n_base = base.count()
    # churn: two unseen clusters' members assign to the nearest OLD
    # cells and drag those cells' means away from their centroids
    churn = _clusters(spark, [4, 5], per=60)
    ann_index_insert(churn, index_root)
    total = n_base + churn.count()

    before = ann_index_maintain(
        spark, index_root, recall_bound=0.0, probe_sample=24, k=10,
        n_probe=2, refine_factor=4,
    )["recall"]

    r = ann_index_refit_cells(spark, index_root)
    assert r["drifted_cells"], f"no drift detected: {r['displacement']}"
    assert r["rewritten_cells"]
    # the scale claim: a cell-subset rewrite, not a corpus rewrite
    assert len(r["rewritten_cells"]) < 8
    assert 0 < r["n_rows_rewritten"] < total

    vecs = manifest_read(spark, f"{index_root}/vectors")
    assert vecs.count() == total  # nothing lost, nothing duplicated
    assert vecs.select("neighbor_id").distinct().count() == total

    after = ann_index_maintain(
        spark, index_root, recall_bound=0.0, probe_sample=24, k=10,
        n_probe=2, refine_factor=4,
    )["recall"]
    assert after >= before - 0.02  # never regress (noise margin)

    # epoch consistency: recall is measurable end-to-end post-rewrite
    probes = churn.limit(8)
    rec = ann_index_recall(
        probes, index_root,
        base.unionByName(churn), k=5, n_probe=4, refine_factor=4,
    )
    assert rec.count() == 8


def test_maintain_cell_local_strategy_reports_telemetry(spark, index_root):
    ann_index_build(
        _clusters(spark, range(4)), index_root,
        n_centroids=8, m_subspaces=8, ks_codes=16,
    )
    ann_index_insert(_clusters(spark, [4, 5], per=60), index_root)
    r = ann_index_maintain(
        spark, index_root, recall_bound=0.99, strategy="cell_local",
        probe_sample=24, k=10, n_probe=2, refine_factor=4,
    )
    # a breach at this bound is guaranteed; cell_local never escalates
    assert "n_vectors" not in r
    assert r["cell_refit"]["drifted_cells"]
    if r["refit"]:
        assert r["refit_strategy"] == "cell_local"
        assert r["recall_after"] is not None


def test_auto_escalates_to_full_when_nothing_drifted(spark, index_root):
    """Breach with NO detectable cell drift (threshold cranked up):
    'auto' pays its single full refit — the codebook-level fallback."""
    ann_index_build(
        _clusters(spark, range(4)), index_root,
        n_centroids=8, m_subspaces=8, ks_codes=16,
    )
    ann_index_insert(_clusters(spark, range(4, 10)), index_root)
    r = ann_index_maintain(
        spark, index_root, recall_bound=0.9, strategy="auto",
        displacement_threshold=100.0,
        probe_sample=24, k=10, n_probe=2, refine_factor=4,
    )
    assert r["refit"] is True
    assert r["refit_strategy"] == "full"
    assert r["n_vectors"] == 10 * 60
    assert r["cell_refit"]["drifted_cells"] == []
