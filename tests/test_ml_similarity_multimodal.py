"""Similarity search (brute force + LSH) and multimodal plumbing."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from nutch_spark.ml.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    media_refs_from_docs,
    resize_plan,
    synth_media,
)
from nutch_spark.ml.similarity import brute_force_topk, lsh_bucket_topk

DIM = 8


def embeddings(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_brute_force_topk_exact(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(30, DIM)
    emb = embeddings(spark, vecs)
    q = embeddings(spark, vecs[:2]).withColumnRenamed("vec_id", "query_id")
    out = brute_force_topk(emb, q, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 5
        # verify against numpy
        qv = vecs[qid]
        sims = {
            j: float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for j, v in enumerate(vecs)
            if j != qid
        }
        expected = sorted(sims, key=lambda j: (-sims[j], j))[:5]
        got = [r["vec_id"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert got == expected
        for r in rows:
            assert r["cosine_sim"] == pytest.approx(sims[r["vec_id"]], abs=2e-4)


def test_lsh_topk_recall(spark):
    rng = np.random.RandomState(11)
    base = rng.randn(40, DIM)
    # plant near-neighbors of vec 0
    base[1] = base[0] + 0.01 * rng.randn(DIM)
    base[2] = base[0] + 0.02 * rng.randn(DIM)
    emb = embeddings(spark, base)
    q = embeddings(spark, base[:1]).withColumnRenamed("vec_id", "query_id")
    out = lsh_bucket_topk(emb, q, k=3, dim=DIM, n_bits=4, tables=6).collect()
    got = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # planted near-dups must surface at the top
    assert got[:2] == [1, 2]


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [
            ("http://h0.example.com/doc/1",
             [("media", "m", "http://h0.example.com/media/5.img", 0),
              ("text", "t", None, 1),
              ("media", "m", "http://h0.example.com/media/6.img", 2)]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    refs = media_refs_from_docs(docs)
    assert refs.count() == 2
    media = synth_media(refs)
    rows = media.collect()
    assert all(r["mime"] == "image/png" for r in rows)
    assert all(len(r["bytes"]) == 64 for r in rows)  # 4x md5 hex -> 64 raw bytes

    feats = extract_features(media).collect()
    assert all(len(r["feature"]) == FEATURE_DIM for r in feats)
    assert all(0.0 <= x < 1.0 for r in feats for x in r["feature"])
    # deterministic
    feats2 = extract_features(media).collect()
    assert {r["media_ref"]: r["feature"] for r in feats} == {
        r["media_ref"]: r["feature"] for r in feats2
    }


def test_real_decode_path_is_stubbed(spark):
    docs = spark.createDataFrame(
        [("http://h.example.com/d", [("media", "m", "http://h.example.com/m.img", 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    media = synth_media(media_refs_from_docs(docs))
    with pytest.raises(Exception) as ei:
        extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "image decoding" in str(ei.value)


def test_resize_and_frame_plans(spark):
    media = spark.createDataFrame(
        [("a", 1920, 1080, None), ("b", 100, 50, None), ("v", 640, 480, 3500)],
        "media_ref string, width int, height int, duration_ms long",
    )
    rp = {r["media_ref"]: r for r in resize_plan(media, max_side=512).collect()}
    assert rp["a"]["target_width"] == 512 and rp["a"]["target_height"] == 288
    assert rp["b"]["target_width"] == 100  # no upscaling
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_ivf_topk_recall_and_determinism(spark):
    from nutch_spark.ml.similarity import ivf_topk

    rng = np.random.RandomState(13)
    base = rng.randn(60, DIM)
    # plant near-neighbors of vec 0 (same cell with overwhelming odds)
    base[1] = base[0] + 0.01 * rng.randn(DIM)
    base[2] = base[0] + 0.02 * rng.randn(DIM)
    emb = embeddings(spark, base)
    q = embeddings(spark, base[:1]).withColumnRenamed("vec_id", "query_id")
    out = ivf_topk(emb, q, k=3, n_centroids=8, n_probe=3).collect()
    got = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert got[:2] == [1, 2]
    # deterministic seed centroids: a second run is row-identical
    out2 = ivf_topk(emb, q, k=3, n_centroids=8, n_probe=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_ivf_full_probe_equals_brute_force(spark):
    """Probing every cell makes IVF exhaustive: results must equal the
    brute-force baseline exactly (same re-rank, same tie-breaks)."""
    from nutch_spark.ml.similarity import ivf_topk

    rng = np.random.RandomState(17)
    base = rng.randn(40, DIM)
    emb = embeddings(spark, base)
    q = embeddings(spark, base[:2]).withColumnRenamed("vec_id", "query_id")
    exact = brute_force_topk(emb, q, k=5).collect()
    full = ivf_topk(emb, q, k=5, n_centroids=6, n_probe=6).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, full))


def test_ivf_train_improves_or_keeps_cells(spark):
    from nutch_spark.ml.similarity import _centroid_seeds, ivf_assign, ivf_train

    rng = np.random.RandomState(19)
    # two well-separated blobs: trained centroids must land one per blob
    blob_a = rng.randn(20, DIM) * 0.1 + 5.0
    blob_b = rng.randn(20, DIM) * 0.1 - 5.0
    vecs = np.vstack([blob_a, blob_b])
    emb = embeddings(spark, vecs)
    cents = ivf_train(emb, n_centroids=2, iters=2)
    assert len(cents) == 2
    asg = ivf_assign(emb.select("vec_id", "embedding"), cents).collect()
    by_cluster = {}
    for r in asg:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"] < 20)
    # every cell is pure: all blob-A members or all blob-B members
    assert all(len(v) == 1 for v in by_cluster.values())


def test_cosine_nan_embedding_scores_zero(spark):
    """A NaN component must not make its vector rank #1 everywhere:
    Spark sorts NaN above every real double, so cosine() maps a NaN
    denominator to 0 like the zero-norm case."""
    from nutch_spark.ml.similarity import cosine

    df = spark.createDataFrame(
        [([float("nan"), 1.0], [1.0, 1.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    vals = [r["c"] for r in
            df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert vals[0] == 0.0
    assert abs(vals[1] - 1.0) < 1e-9


def test_recommended_n_bits_scaling():
    from nutch_spark.ml.similarity import recommended_n_bits

    # expected bucket ~ N / 2^bits <= target
    assert recommended_n_bits(1000) == 1  # under target: no split needed
    assert recommended_n_bits(10**6, target_bucket=4096) == 8
    assert recommended_n_bits(10**9, target_bucket=4096) == 18
    assert recommended_n_bits(10**10, target_bucket=4096) == 22
    for n in (10**6, 10**9):
        bits = recommended_n_bits(n)
        assert n / 2**bits <= 4096


def test_similarity_topk_dispatch_plan_shape(spark):
    from nutch_spark.ml.similarity import similarity_topk

    rng = np.random.RandomState(5)
    vecs = rng.randn(30, DIM)
    emb = embeddings(spark, vecs)
    q = embeddings(spark, vecs[:3]).withColumnRenamed("vec_id", "query_id")
    # small Q: exact brute force — the broadcast nested-loop crossJoin
    small = similarity_topk(emb, q, k=3, n_queries=3)
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" in plan or "CartesianProduct" in plan
    # above the threshold: LSH bucket join, no nested-loop product
    big = similarity_topk(
        emb, q, k=3, n_queries=999, q_threshold=64, dim=DIM, n_bits=4, tables=6
    )
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan_big
    assert "CartesianProduct" not in plan_big
    # both plans produce the planted ranking for an easy query set
    assert {r["query_id"] for r in small.collect()} == {0, 1, 2}
    assert {r["query_id"] for r in big.collect()} == {0, 1, 2}


def test_recommended_bucket_cap_sizing():
    """The cap rule must bound per-doc candidate pairs by
    pairs_per_doc, bound adversarial-total pairs by pairs_factor*N,
    keep the >=16 recall floor, and grow monotonically in N."""
    from nutch_spark.ml.similarity import recommended_bucket_cap

    # large corpora: per-doc budget binds — bands*(cap-1) <= pairs_per_doc
    for n in (10**6, 10**9, 10**10):
        for bands in (2, 4, 8, 16):
            cap = recommended_bucket_cap(n, bands=bands, pairs_per_doc=64)
            assert bands * (cap - 1) <= max(64, bands * 15), (n, bands, cap)
            assert cap >= 16
    # tiny corpus: the floor holds even when the total bound is tighter
    assert recommended_bucket_cap(10, bands=4) == 16
    # adversarial-total bound: bands * C(cap,2) <= pairs_factor * N
    # whenever the cap sits above the floor
    n, bands = 10**4, 4
    cap = recommended_bucket_cap(n, bands=bands, pairs_per_doc=10**9)
    assert bands * cap * (cap - 1) // 2 <= 32 * n * 1.1
    # monotone in corpus size (total bound regime)
    caps = [
        recommended_bucket_cap(n, bands=4, pairs_per_doc=10**9)
        for n in (10**3, 10**5, 10**7)
    ]
    assert caps == sorted(caps)
    with pytest.raises(ValueError):
        recommended_bucket_cap(0)


def test_ivf_assign_join_form_vec_id_contract(spark, caplog):
    """The join form requires vec_id: a frame without one must fall
    back to the literal form with a warning (not an AnalysisException),
    producing the same assignments; duplicate vec_ids must keep their
    row count through the join-back."""
    import logging as _logging

    from nutch_spark.ml.similarity import ivf_assign

    rng = np.random.RandomState(11)
    vecs = rng.randn(20, DIM)
    cents = [(i, [float(x) for x in rng.randn(DIM)]) for i in range(4)]
    emb = embeddings(spark, vecs)

    want = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(emb, cents, method="literal").collect()
    }
    # no vec_id column -> warned literal fallback, same clusters
    no_id = emb.select(F.col("vec_id").alias("row_tag"), "embedding")
    with caplog.at_level(_logging.WARNING, logger="nutch_spark.ml.similarity"):
        got = ivf_assign(no_id, cents, method="join").collect()
    assert any("vec_id" in r.message for r in caplog.records)
    assert {r["row_tag"]: r["cluster"] for r in got} == want

    # duplicate vec_ids: join-back keeps row count (grouped side is
    # one row per id), assignments still the literal ones
    dup = emb.union(emb)
    got_dup = ivf_assign(dup, cents, method="join").collect()
    assert len(got_dup) == 40
    assert {r["vec_id"]: r["cluster"] for r in got_dup} == want


def test_bucket_cap_bounds_adversarial_single_bucket(spark, caplog):
    import logging as _logging

    from nutch_spark.ml.similarity import embedding_near_duplicates

    # adversarial corpus: 60 identical vectors — every LSH table puts
    # them all in ONE bucket, so the uncapped self-join is 60*59/2
    # pairs per table; the cap bounds members per (table, bucket)
    vecs = [[1.0] * DIM for _ in range(60)]
    emb = embeddings(spark, vecs)
    from nutch_spark.ml.capobs import flush_cap_drop_logs

    with caplog.at_level(_logging.WARNING, logger="nutch_spark.ml.similarity"):
        out = embedding_near_duplicates(
            emb, threshold=0.9, dim=DIM, n_bits=4, tables=2, bucket_cap=10
        ).collect()
        flush_cap_drop_logs()  # drop counts ride the action; join loggers
    # at most C(10,2) distinct pairs can survive per table; with
    # identical members both tables pick the same md5-ordered sample
    assert 0 < len(out) <= 2 * 45
    assert any("dropped" in r.message for r in caplog.records)
    # uncapped: the full quadratic pair set comes back
    full = embedding_near_duplicates(
        emb, threshold=0.9, dim=DIM, n_bits=4, tables=2
    ).count()
    assert full == 60 * 59 // 2


def test_bucket_cap_no_drop_no_log(spark, caplog):
    import logging as _logging

    from nutch_spark.ml.similarity import embedding_near_duplicates

    rng = np.random.RandomState(3)
    emb = embeddings(spark, rng.randn(20, DIM))
    from nutch_spark.ml.capobs import flush_cap_drop_logs

    with caplog.at_level(_logging.WARNING, logger="nutch_spark.ml.similarity"):
        embedding_near_duplicates(
            emb, threshold=0.99, dim=DIM, n_bits=4, tables=2, bucket_cap=1000
        ).collect()
        flush_cap_drop_logs()
    assert not [r for r in caplog.records if "dropped" in r.message]


def test_ivf_assign_dispatch_forms_agree(spark):
    """The >threshold join form must produce the exact assignments of
    the literal form (same cosine, same tie-break), and the dispatch
    must actually switch plans: literal = zero-join map, join =
    broadcast join + aggregate."""
    from nutch_spark.ml.similarity import _centroid_seeds, ivf_assign

    rng = np.random.RandomState(11)
    emb = embeddings(spark, rng.randn(40, DIM))
    cents = _centroid_seeds(emb, 8)

    lit = ivf_assign(emb, cents, method="literal")
    jn = ivf_assign(emb, cents, method="join")
    got_lit = {r["vec_id"]: r["cluster"] for r in lit.collect()}
    got_jn = {r["vec_id"]: r["cluster"] for r in jn.collect()}
    assert got_lit == got_jn

    plan_lit = lit._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan_lit  # pure map-side column arithmetic
    plan_jn = jn._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan_jn and "Aggregate" in plan_jn

    # auto dispatch: picks by centroid count (the docstring's promise,
    # now in code: > _ASSIGN_JOIN_THRESHOLD switches to the join form)
    from nutch_spark.ml.similarity import _ASSIGN_JOIN_THRESHOLD

    auto_small = ivf_assign(emb, cents)  # 8 <= threshold -> literal
    assert "Join" not in auto_small._jdf.queryExecution().executedPlan().toString()
    many = [(i + 1, list(map(float, rng.randn(DIM)))) for i in range(_ASSIGN_JOIN_THRESHOLD + 1)]
    auto_big = ivf_assign(emb, many)
    assert "Join" in auto_big._jdf.queryExecution().executedPlan().toString()

    with pytest.raises(ValueError):
        ivf_assign(emb, cents, method="bogus")


def test_ivf_assign_join_ties_break_like_literal(spark):
    """Duplicate centroids force cosine ties; both forms must pick the
    lower centroid id."""
    from nutch_spark.ml.similarity import ivf_assign

    emb = embeddings(spark, [[1.0] + [0.0] * (DIM - 1)])
    v = [1.0] + [0.0] * (DIM - 1)
    cents = [(3, v), (1, v), (2, v)]
    for method in ("literal", "join"):
        got = ivf_assign(emb, cents, method=method).collect()[0]["cluster"]
        assert got == 1, method
