"""Unit tests for the non-oracle-checkable extension operators: sketch-based
dedup (MinHash-LSH, SimHash), LSH ANN recall, MLlib imputer, multimodal
plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_col,
    simhash_near_duplicates,
)
from data_management_service_run_etl_imputations_spark.operators.imputation import (
    impute_with_group_stats,
    ml_imputer,
)
from data_management_service_run_etl_imputations_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    with_binary_metadata,
)
from data_management_service_run_etl_imputations_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm mat near the old oak door beside the garden wall"
)


@pytest.fixture(scope="module")
def doc_corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),                               # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),     # near dup of 0
        (3, "completely different short text about spark engines"),
        (4, "another unrelated document mentioning nothing similar at all "
            "with plenty of words to shingle across the window boundary"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_minhash_lsh_finds_exact_and_near_dups(doc_corpus):
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_candidates(
            doc_corpus, "doc_id", "text", num_perm=32, bands=8, k=5
        ).collect()
    }
    assert pairs.get((0, 1)) == 1.0          # exact dup → identical signature
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup → banded collision
    assert (0, 3) not in pairs and (0, 4) not in pairs


def test_minhash_est_tracks_exact_jaccard(doc_corpus):
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            doc_corpus, "doc_id", "text", k=5, threshold=0.0
        ).collect()
    }
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_candidates(
            doc_corpus, "doc_id", "text", num_perm=32, bands=8, k=5
        ).collect()
    }
    for pair, e in est.items():
        if pair in exact:
            assert abs(e - exact[pair]) < 0.35  # 32-perm sketch tolerance


def test_simhash_deterministic_and_dup_identical(spark, doc_corpus):
    a = doc_corpus.select("doc_id", simhash_col("text").alias("sh")).collect()
    b = doc_corpus.select("doc_id", simhash_col("text").alias("sh")).collect()
    assert {r.doc_id: r.sh for r in a} == {r.doc_id: r.sh for r in b}
    sh = {r.doc_id: r.sh for r in a}
    assert sh[0] == sh[1]  # identical text → identical simhash


def test_simhash_near_duplicates_pairs(doc_corpus):
    pairs = {(r.id_a, r.id_b) for r in
             simhash_near_duplicates(doc_corpus, "doc_id", "text",
                                     max_hamming=3).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, dims=64, k=5, n_planes=8).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    # multi-probe 8-plane LSH on 64-dim random data: expect decent recall
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_ml_imputer_median(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (100.0,), (None,)], "x DOUBLE"
    )
    out = ml_imputer(df, ["x"], strategy="median")
    filled = [r.x_imputed for r in out.collect() if r.x is None]
    assert filled == [2.0]


def test_impute_group_stats_all_null_group_falls_back_global(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None), ("a", None)],
        "g STRING, v DOUBLE",
    )
    out = impute_with_group_stats(df, "v", ["g"], strategy="mean", out_col="vi")
    got = {(r.g, r.v): r.vi for r in out.collect()}
    assert got[("a", None)] == 2.0   # group mean
    assert got[("b", None)] == 2.0   # all-null group → global mean


def test_multimodal_metadata_and_features(spark):
    assets = spark.createDataFrame(
        [(1, "image", bytearray(b"abc123"), "image/png", {"w": "10"}),
         (2, "audio", bytearray(b""), "audio/wav", {})],
        "asset_id LONG, kind STRING, payload BINARY, mime STRING, meta MAP<STRING,STRING>",
    )
    meta = with_binary_metadata(assets).collect()
    by_id = {r.asset_id: r for r in meta}
    assert by_id[1].n_bytes == 6
    assert len(by_id[1].content_sha256) == 64

    feats = extract_features(assets, dims=8).collect()
    fb = {r.asset_id: r for r in feats}
    assert len(fb[1].feature) == 8
    assert abs(sum(fb[1].feature) - 1.0) < 1e-5  # normalized histogram
    assert fb[2].n_bytes == 0

    # strict raises per-payload inside the executor for unrecognized
    # formats (surfaces when the job actually runs, wrapped by PySpark).
    with pytest.raises(Exception, match="NotImplementedError"):
        extract_features(assets, strict=True).collect()


def test_multimodal_real_decode_roundtrip(spark):
    from data_management_service_run_etl_imputations_spark.operators.multimodal import (
        decode_jpeg_header,
        decode_media,
        synth_png,
        synth_wav,
    )

    # distributed: real WAV + PNG payloads decode to exact planted values
    assets = spark.createDataFrame(
        [(1, "audio", bytearray(synth_wav(440.0)), "audio/wav", {}),
         (2, "image", bytearray(synth_png(20, 10)), "image/png", {})],
        "asset_id LONG, kind STRING, payload BINARY, mime STRING, meta MAP<STRING,STRING>",
    )
    fb = {r.asset_id: r for r in extract_features(assets, dims=8).collect()}
    wav = fb[1].feature
    assert wav[0] == 1.0 and wav[2] == 8000.0 and wav[5] == 440.0
    assert abs(wav[6] - 0.5 / 2**0.5) < 1e-3  # RMS of a 0.5-amp sine
    png = fb[2].feature
    assert png[0] == 2.0 and png[1] == 20.0 and png[2] == 10.0
    assert fb[2].n_bytes == 68 + 10 * 21  # stored-deflate framing math

    # strict accepts recognized formats (no raise)
    assert len(extract_features(assets, strict=True).collect()) == 2

    # JPEG header path (local: minimal SOI + SOF0 + EOI stream)
    import struct as s

    jpeg = (b"\xff\xd8"
            + b"\xff\xc0" + s.pack(">H", 11) + b"\x08"
            + s.pack(">HH", 7, 9) + b"\x03" + b"\x00" * 6
            + b"\xff\xd9")
    assert decode_jpeg_header(jpeg)[:4] == [3.0, 9.0, 7.0, 3.0]
    assert decode_media(jpeg, dims=8)[0] == 3.0


def test_frame_sample_plan(spark):
    assets = spark.createDataFrame(
        [(1, "video", bytearray(b"v"), "video/mp4", {"n_frames": "95"}),
         (2, "image", bytearray(b"i"), "image/png", {})],
        "asset_id LONG, kind STRING, payload BINARY, mime STRING, meta MAP<STRING,STRING>",
    )
    rows = frame_sample_plan(assets, every_n=10, max_frames=8).collect()
    assert {r.asset_id for r in rows} == {1}
    assert [r.frame_index for r in rows] == [0, 10, 20, 30, 40, 50, 60, 70]


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    from data_management_service_run_etl_imputations_spark.operators.similarity import (
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=4).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    # probing half the cells on clustered-ish random data: expect ≥0.4 mean
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_hll_sketch_union_matches_direct_sketch(spark):
    """Sketch mergeability — the property the 100 TB rollup relies on:
    unioning per-group HLL sketches must estimate the same as one sketch
    built over the whole input (HLL union is lossless at equal k)."""
    from pyspark.sql import functions as F

    df = spark.range(20_000).withColumn("g", (F.col("id") % 7).cast("int"))
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("id")).alias("est")
    ).collect()[0]["est"]
    assert merged == direct
    assert abs(direct - 20_000) <= 0.05 * 20_000


def test_gif_bmp_header_decode():
    """GIF/BMP header parses return (format tag, width, height, depth)
    from hand-built minimal fixtures; corrupt payloads raise."""
    import struct

    import pytest

    from data_management_service_run_etl_imputations_spark.operators.multimodal import (
        decode_bmp_header,
        decode_gif_header,
        decode_media,
    )

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + bytes([0x91, 0, 0])
    assert decode_gif_header(gif) == [4.0, 320.0, 200.0, 2.0]
    # no global palette flag -> palette_bits 0
    gif2 = b"GIF87a" + struct.pack("<HH", 8, 4) + bytes([0x00, 0, 0])
    assert decode_gif_header(gif2)[3] == 0.0

    bmp = (
        b"BM" + struct.pack("<IHHI", 100, 0, 0, 54)
        + struct.pack("<I", 40) + struct.pack("<ii", 64, -48)
        + struct.pack("<HH", 1, 24) + bytes(4)
    )
    assert decode_bmp_header(bmp) == [5.0, 64.0, 48.0, 24.0]

    with pytest.raises(ValueError):
        decode_gif_header(b"GIF89a\x01")
    with pytest.raises(ValueError):
        decode_bmp_header(b"BMxx")
    # decode_media routes by magic and pads to dims
    assert decode_media(gif, dims=6) == [4.0, 320.0, 200.0, 2.0, 0.0, 0.0]
    assert decode_media(bmp, dims=6)[0] == 5.0


def test_observation_metrics_on_flagship_plan(spark, sf_dir):
    """`df.observe` attaches named aggregate metrics to a plan and
    collects them as a side effect of the SAME action — the production
    way to get row counts / null rates / sums out of a 100 TB pipeline
    run without a second scan. Metrics must match an independent
    aggregation."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from data_management_service_run_etl_imputations_spark.schemas import load_table

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("orders_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_totalprice").alias("total_price"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
    )
    out = observed.groupBy("o_orderpriority").count().collect()
    assert len(out) > 0
    m = obs.get
    exact = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").alias("t"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("f"),
    ).collect()[0]
    assert m["n_rows"] == exact["n"]
    assert abs(m["total_price"] - exact["t"]) < 1e-6
    assert m["n_f"] == exact["f"]


def test_impute_regression_recovers_planted_signal(spark):
    """Deterministic planted-signal oracle: per segment, y = a + b*x
    exactly on observed rows; nulled rows must come back as EXACTLY the
    planted line value (closed-form OLS on exact data has zero residual;
    float error is absorbed by round-6)."""
    from data_management_service_run_etl_imputations_spark.operators.imputation import (
        impute_regression,
    )

    rows = []
    lines = {"s1": (3.0, 2.0), "s2": (-5.0, 0.5)}
    for seg, (a, b) in lines.items():
        for x in range(40):
            y = a + b * x
            rows.append((seg, x, None if x % 7 == 3 else y, y))
    df = spark.createDataFrame(rows, "seg STRING, x LONG, y DOUBLE, y_true DOUBLE")
    out = impute_regression(df, "y", "x", ["seg"], out_col="y_hat").collect()
    for r in out:
        assert round(r.y_hat, 6) == round(r.y_true, 6), r


def test_impute_regression_fallback_ladder(spark):
    """Degenerate segments: <2 observations or zero feature variance →
    segment mean; all-null segment → global mean of observed values."""
    from data_management_service_run_etl_imputations_spark.operators.imputation import (
        impute_regression,
    )

    rows = [
        # zero x-variance: observed mean = 10.0
        ("const_x", 5, 8.0),
        ("const_x", 5, 12.0),
        ("const_x", 5, None),
        # single observation: mean = 7.0
        ("one_obs", 1, 7.0),
        ("one_obs", 2, None),
        # all null: global mean of observed = (8+12+7)/3 = 9.0
        ("empty", 1, None),
        ("empty", 2, None),
    ]
    df = spark.createDataFrame(rows, "seg STRING, x LONG, y DOUBLE")
    got = {
        (r.seg, r.x): r.yi
        for r in impute_regression(df, "y", "x", ["seg"], out_col="yi").collect()
        if r.y is None
    }
    assert got[("const_x", 5)] == 10.0
    assert got[("one_obs", 2)] == 7.0
    assert got[("empty", 1)] == got[("empty", 2)] == 9.0


def test_impute_regression_null_feature_falls_back(spark):
    from data_management_service_run_etl_imputations_spark.operators.imputation import (
        impute_regression,
    )

    rows = [("s", 0, 0.0), ("s", 10, 10.0), ("s", None, None)]
    df = spark.createDataFrame(rows, "seg STRING, x LONG, y DOUBLE")
    out = {
        r.x: r.yi
        for r in impute_regression(df, "y", "x", ["seg"], out_col="yi").collect()
    }
    # no feature to predict from → segment mean of observed (5.0)
    assert out[None] == 5.0


def test_png_pixel_decode_all_filters():
    """decode_png_pixels reconstructs exact pixels through zlib inflate
    + defilter of all five PNG filter types; per-channel means match the
    closed form synth_png_rgb plants (wrong Paeth/Average/Sub/Up
    arithmetic shifts every mean)."""
    from data_management_service_run_etl_imputations_spark.operators.multimodal import (
        decode_media,
        decode_png_pixels,
        synth_png,
        synth_png_rgb,
    )

    # constant gray, filter 0 only: mean == gray value
    f = decode_png_pixels(synth_png(20, 10, gray=77))
    assert f == [2.0, 20.0, 10.0, 8.0, 0.0, 1.0, 77.0, 0.0, 0.0, 0.0]
    # RGB gradient across every filter type (height ≥ 5 covers all)
    for w, h in [(16, 16), (47, 31), (5, 9), (1, 1)]:
        f = decode_png_pixels(synth_png_rgb(w, h))
        base = (w - 1) / 2 + (h - 1) / 2
        assert f[:6] == [2.0, float(w), float(h), 8.0, 2.0, 3.0]
        assert f[6:9] == [base, base + 1, base + 2]
    # strict routes PNG to the pixel decoder; default keeps headers
    p = synth_png_rgb(10, 10)
    assert decode_media(p, dims=10, strict=True)[6] == 9.0
    assert decode_media(p, dims=10, strict=False)[5] == 0.0  # header pad
    # refusals stay loud in strict mode
    with pytest.raises(NotImplementedError):
        decode_media(b"not media", strict=True)


def test_png_pixel_decode_strict_mapinpandas(spark):
    """The strict pixel decode through the real Arrow/mapInPandas path:
    per-channel means come back exact for every planted image."""
    from data_management_service_run_etl_imputations_spark.operators.multimodal import (
        extract_features,
        synth_png_rgb,
    )

    rows = [
        (i, "image", bytearray(synth_png_rgb(16 + i % 32, 16 + i % 16)))
        for i in range(12)
    ]
    assets = spark.createDataFrame(
        rows, "asset_id LONG, kind STRING, payload BINARY"
    )
    out = extract_features(assets, dims=10, strict=True).collect()
    assert len(out) == 12
    for r in out:
        i = r["asset_id"]
        w, h = 16 + i % 32, 16 + i % 16
        base = (w - 1) / 2 + (h - 1) / 2
        feat = r["feature"]
        assert feat[1] == w and feat[2] == h
        assert feat[6] == pytest.approx(base, abs=1e-4)
        assert feat[8] == pytest.approx(base + 2, abs=1e-4)
