"""Similarity search over the embeddings table (vec_id, embedding
array<float>, label).

- ``brute_force_topk``: exact cosine top-k — dot products via
  ``F.zip_with`` + ``F.aggregate`` (JVM-side, no Python), ranks via a
  per-query window. The baseline and the verifier for approximate
  variants.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH (sign
  bits from deterministic hash-derived hyperplanes) buckets the corpus;
  candidates = same bucket (multi-probe over `tables` independent
  hash tables); exact cosine re-rank inside buckets only.

Scale: brute force is O(Q*N) — fine for Q small (it broadcasts the
query set); LSH turns it into O(Q * bucket_size) with table count /
bit count trading recall for cost. Both avoid Python entirely.
"""

from __future__ import annotations

import logging
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def recommended_n_bits(corpus_size: int, target_bucket: int = 4096) -> int:
    """Sizing rule for the sign-LSH paths: expected bucket size is
    ~N / 2^n_bits (random hyperplanes on roughly-centered data), so
    pick n_bits = ceil(log2(N / target_bucket)). The default n_bits=8
    (256 buckets) is calibrated to the contract's 10^3..10^5 corpora;
    at 10^9 vectors use ~18 bits (and at 10^10, ~21) or the per-bucket
    self-join goes quadratic. Same rule sizes IVF: n_centroids ~
    N / target_bucket, switching ivf_assign to the broadcast-join form
    above ~256 centroids (see its docstring)."""
    if corpus_size <= target_bucket:
        return 1
    return max(1, math.ceil(math.log2(corpus_size / target_bucket)))


def recommended_bucket_cap(
    corpus_size: int,
    bands: int = 4,
    pairs_per_doc: int = 64,
    pairs_factor: int = 32,
) -> int:
    """Sizing rule for ``bucket_cap`` on every banded path (MinHash /
    simhash32 / simhash64 / sign-LSH) — the knob that keeps a hot
    bucket from going quadratic at 100 TB, codified so a user finds the
    default BEFORE a boilerplate-heavy corpus melts the candidate join.

    Two budgets, take the tighter:

    - per-doc: a member of a capped bucket compares against at most
      ``cap - 1`` others per band, so one doc generates at most
      ``bands * (cap - 1)`` candidate pairs; ``pairs_per_doc`` bounds
      that, keeping the verify stage O(corpus_size).
    - total (adversarial single-bucket corpus): ``bands * C(cap, 2)``
      pairs must stay within ``pairs_factor * corpus_size``, i.e.
      cap <= sqrt(2 * pairs_factor * N / bands) — the bound that
      matters at small N.

    Floor of 16 so legitimate duplicate clusters below that size are
    always fully paired (capping them would silently trade recall for
    nothing — honest buckets are tiny, see ``recommended_n_bits``).
    Logged drops still fire when the cap bites (``capobs``)."""
    if corpus_size < 1 or bands < 1:
        raise ValueError("corpus_size and bands must be positive")
    per_doc = max(1, pairs_per_doc // bands) + 1
    total = math.isqrt(max(1, 2 * pairs_factor * corpus_size // bands)) + 1
    return max(16, min(per_doc, total))


def _cap_bucket_members(
    bucketed: DataFrame,
    keys: list[str],
    order_col: str,
    bucket_cap: int,
    what: str,
) -> DataFrame:
    """Skew guard: keep at most ``bucket_cap`` members per bucket,
    chosen by a deterministic md5 shuffle of the member id (so the
    survivors are an unbiased sample, not a prefix of the id space).
    The count of dropped members is logged — the no-silent-caps rule: a
    capped bucket means recall loss, and the operator says so. The
    window partitions by the same keys the candidate join shuffles on,
    so it rides the same exchange, and the drop count rides the
    caller's own first action via
    :func:`nutch_spark.ml.capobs.observe_cap_drops` (CollectMetrics) —
    one pass, not two."""
    from nutch_spark.ml.capobs import observe_cap_drops

    w = Window.partitionBy(*keys).orderBy(
        F.md5(F.col(order_col).cast("string")), F.col(order_col)
    )
    ranked = bucketed.withColumn("_brank", F.row_number().over(w))
    observed = observe_cap_drops(
        ranked,
        "_brank",
        bucket_cap,
        what,
        log,
        "recall loss on skewed buckets; raise n_bits per "
        "recommended_n_bits to shrink buckets instead of capping harder",
    )
    return observed.filter(F.col("_brank") <= bucket_cap).drop("_brank")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # zero-norm/NaN guard: 0/0 is NaN, a NaN embedding component makes
    # den NaN, and Spark sorts NaN ABOVE every real double and passes
    # NaN >= t filters — such a vector would win rank 1 for every query
    # and appear as a near-dup of its whole bucket. Define both
    # degenerate cases as similarity 0 instead.
    den = norm(a) * norm(b)
    return F.when(F.isnan(den) | (den == 0.0), F.lit(0.0)).otherwise(
        dot(a, b) / den
    )


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries``: (query_id, embedding). Returns (query_id, vec_id,
    cosine_sim, rank). Self-matches (same id) are excluded.

    Q bound: this is an O(N*Q) broadcast crossJoin — the RIGHT plan
    only while the query set is small (rule of thumb Q <= ~64 at 10^9
    corpus rows: one corpus scan evaluating Q dot products per row; the
    broadcast itself caps Q at driver/executor memory). Above that,
    route through :func:`similarity_topk`, which dispatches to
    :func:`lsh_bucket_topk` (or call the LSH/IVF paths directly).
    """
    q = queries.select(
        F.col("query_id"), F.col("embedding").alias("q_emb")
    )
    c = embeddings.select("vec_id", F.col("embedding").alias("c_emb"))
    joined = c.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    sim = F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return (
        joined.select("query_id", "vec_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, table: int, bit: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    derived from a splitmix-style integer mix of (table, bit, d)."""
    x = (table * 1_000_003 + bit * 10_007 + d * 101 + 12345) & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    x = x ^ (x >> 31)
    return (x % 2_000_000) / 1_000_000.0 - 1.0


def lsh_sign_bucket(emb: Column, dim: int, table: int, n_bits: int) -> Column:
    """Bucket id = integer of sign bits of `n_bits` hyperplane dots."""
    bucket = F.lit(0).cast("long")
    for b in range(n_bits):
        plane = F.array(*[F.lit(_hyperplane(dim, table, b, d)) for d in range(dim)])
        bucket = bucket + F.when(dot(emb, plane) > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.9,
    dim: int = 16,
    n_bits: int = 8,
    tables: int = 4,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs — the vector-space member of the
    dedup family (ml/dedup.py): candidates are corpus pairs sharing a
    sign-LSH bucket in ANY of the `tables` hash tables; candidates are
    then verified by exact cosine >= threshold. Returns
    (vec_a, vec_b, cosine_sim), vec_a < vec_b.

    Scale: the all-pairs O(n^2) problem becomes per-bucket self-joins
    (each bucket a separate shuffle key); near-identical vectors always
    share every bucket, so recall loss only affects borderline pairs —
    the standard prune-then-verify shape, all JVM. Size ``n_bits`` with
    :func:`recommended_n_bits` (the default 8 fits ~10^5-row corpora,
    NOT 10^9 — see that docstring). ``bucket_cap`` is the skew guard
    for adversarial/degenerate buckets (e.g. the zero vector, scraper
    boilerplate): at most that many members per (table, bucket) enter
    the self-join, a deterministic md5-shuffled sample, and the dropped
    count is logged — never silently. Size it with
    :func:`recommended_bucket_cap` (bands = ``tables`` here)."""
    c = embeddings.select("vec_id", F.col("embedding").alias("emb"))
    b = c.select(
        "vec_id",
        "emb",
        F.posexplode(
            F.array(*[lsh_sign_bucket(F.col("emb"), dim, t, n_bits) for t in range(tables)])
        ).alias("table", "bucket"),
    )
    if bucket_cap is not None:
        b = _cap_bucket_members(
            b, ["table", "bucket"], "vec_id", bucket_cap, "embedding_near_duplicates"
        )
    a_ = b.alias("a")
    b_ = b.alias("b")
    cand = (
        a_.join(
            b_,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.emb").alias("ea"),
            F.col("b.emb").alias("eb"),
        )
        .distinct()
    )
    sim = F.round(cosine(F.col("ea"), F.col("eb")), 6)
    return cand.select("vec_a", "vec_b", sim.alias("cosine_sim")).filter(
        F.col("cosine_sim") >= threshold
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 16,
    n_bits: int = 8,
    tables: int = 4,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in any of the
    hash tables; exact cosine re-rank on candidates. Size ``n_bits``
    with :func:`recommended_n_bits`; ``bucket_cap`` caps corpus members
    per (table, bucket) with a logged drop count (skew guard — see
    :func:`embedding_near_duplicates`)."""
    c = embeddings.select("vec_id", F.col("embedding").alias("c_emb"))
    q = queries.select("query_id", F.col("embedding").alias("q_emb"))
    c_b = c.select(
        "vec_id",
        "c_emb",
        F.posexplode(
            F.array(*[lsh_sign_bucket(F.col("c_emb"), dim, t, n_bits) for t in range(tables)])
        ).alias("table", "bucket"),
    )
    if bucket_cap is not None:
        c_b = _cap_bucket_members(
            c_b, ["table", "bucket"], "vec_id", bucket_cap, "lsh_bucket_topk"
        )
    q_b = q.select(
        "query_id",
        "q_emb",
        F.posexplode(
            F.array(*[lsh_sign_bucket(F.col("q_emb"), dim, t, n_bits) for t in range(tables)])
        ).alias("table", "bucket"),
    )
    cand = (
        c_b.join(F.broadcast(q_b), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "q_emb", "c_emb")
        .distinct()
    )
    sim = F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return (
        cand.select("query_id", "vec_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def similarity_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    q_threshold: int = 64,
    n_queries: int | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """Top-k dispatch (the entry point callers should use): exact
    brute force while the query set is small enough that the O(N*Q)
    broadcast crossJoin is the best plan, sign-LSH bucketing above the
    threshold. Pass ``n_queries`` when the caller already knows |Q|
    (avoids the count job); ``lsh_kwargs`` forward dim/n_bits/tables/
    bucket_cap to :func:`lsh_bucket_topk`."""
    q_count = queries.count() if n_queries is None else n_queries
    if q_count <= q_threshold:
        return brute_force_topk(embeddings, queries, k=k)
    return lsh_bucket_topk(embeddings, queries, k=k, **lsh_kwargs)


def _centroid_seeds(embeddings: DataFrame, n_centroids: int) -> list:
    """Deterministic centroid seeds: the `n_centroids` corpus vectors
    with the lowest md5(vec_id) — an order-stable uniform sample
    (TakeOrdered prune, no global sort materialized). Returns
    [(centroid_id 1..C, [float dims])] collected to the driver (C is a
    small constant; the centroid table must broadcast anyway)."""
    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(n_centroids)
        .collect()
    )
    return [(i + 1, [float(v) for v in r["embedding"]]) for i, r in enumerate(rows)]


def _sim_structs(emb: Column, centroids: list) -> Column:
    """Array of (cosine vs centroid, -centroid_id) structs — raw-double
    cosine so ordering ties break exactly like the SQL oracle's
    (sim DESC, centroid_id ASC)."""
    return F.array(
        *[
            F.struct(
                cosine(emb, F.array(*[F.lit(v) for v in vec])).alias("s"),
                F.lit(-cid).alias("nid"),
            )
            for cid, vec in centroids
        ]
    )


# above this many centroids the literal-expression argmin stops being
# the right plan: the expression tree holds n_centroids * dim literals
# and whole-stage codegen degrades (method-size limits force
# interpreted evaluation), so assignment switches to a broadcast
# nested-loop join + groupBy(vec_id) max — the standard shape for big
# coarse quantizers
_ASSIGN_JOIN_THRESHOLD = 256


def _ivf_assign_join(
    embeddings: DataFrame, centroids: list, emb_col: str
) -> DataFrame:
    """Join-form coarse quantizer: centroids as a broadcast table, one
    cosine per (row, centroid) pair, argmin via max(struct) grouped by
    vec_id, assignments joined back to keep the caller's columns. Two
    shuffles on vec_id — the literal form's zero-shuffle plan does not
    survive thousands of centroids, this one does."""
    spark = embeddings.sparkSession
    cent = spark.createDataFrame(
        [(cid, [float(v) for v in vec]) for cid, vec in centroids],
        "c_cid int, c_vec array<double>",
    )
    scored = embeddings.select("vec_id", F.col(emb_col).alias("_e")).join(
        F.broadcast(cent)
    )
    best = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    cosine(F.col("_e"), F.col("c_vec")).alias("s"),
                    (-F.col("c_cid")).alias("nid"),
                )
            ).alias("b")
        )
        .select("vec_id", (-F.col("b.nid")).alias("cluster"))
    )
    return embeddings.join(best, "vec_id")


def ivf_assign(
    embeddings: DataFrame,
    centroids: list,
    emb_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """Add `cluster` = nearest-centroid id (IVF coarse quantizer).

    ``method='literal'``: pure map-side JVM column arithmetic against
    centroid literals — no shuffle, no Python; at 10^9+ corpus rows
    this is the whole cost of list building. ``method='join'``:
    broadcast centroid table + groupBy(vec_id) max — for centroid
    counts too large for literal expression trees. ``'auto'`` picks the
    join form above ``_ASSIGN_JOIN_THRESHOLD`` (256) centroids. Both
    forms produce identical assignments (same cosine, same
    (sim DESC, centroid_id ASC) tie-break).

    vec_id contract (join form only): the join form groups and joins
    back on ``vec_id``, so the frame must carry one and rows must be
    identified by it. A frame WITHOUT a vec_id column falls back to the
    literal form with a warning rather than failing in analysis.
    Duplicate vec_ids keep their row count through the join-back (the
    grouped side has one row per id), but duplicates carrying
    *different* embeddings would share one max-merged assignment — keep
    vec_id unique per row, as every corpus table in this repo does."""
    if method not in ("auto", "literal", "join"):
        raise ValueError(f"unknown ivf_assign method: {method}")
    if method == "join" or (
        method == "auto" and len(centroids) > _ASSIGN_JOIN_THRESHOLD
    ):
        if "vec_id" not in embeddings.columns:
            log.warning(
                "ivf_assign: method=%s selected the join form over %d "
                "centroids but the frame has no vec_id column — falling "
                "back to the literal form (expect degraded codegen at "
                "this centroid count; add a unique vec_id to use the "
                "join plan)",
                method,
                len(centroids),
            )
        else:
            return _ivf_assign_join(embeddings, centroids, emb_col)
    best = F.array_max(_sim_structs(F.col(emb_col), centroids))
    return embeddings.withColumn("cluster", -best["nid"])


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: list | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the cell-probe
    counterpart to ``lsh_bucket_topk``: the corpus is bucketed by
    nearest centroid (coarse quantizer), each query probes only its
    `n_probe` closest cells, and candidates get an exact cosine
    re-rank. Returns (query_id, vec_id, cosine_sim, rank).

    Scale shape: assignment is map-only (centroid literals); the
    candidate join broadcasts (query × probed-cell) pairs against the
    cluster-keyed corpus; re-rank windows partition by query_id. The
    only data-sized pass is one corpus scan. Centroids default to the
    deterministic md5-ordered seed sample (so the whole operator is
    replayable in ANSI SQL); pass ``centroids`` from :func:`ivf_train`
    for Lloyd-refined cells."""
    if centroids is None:
        centroids = _centroid_seeds(embeddings, n_centroids)
    c = ivf_assign(
        embeddings.select("vec_id", F.col("embedding").alias("c_emb")),
        centroids,
        "c_emb",
    )
    q = queries.select("query_id", F.col("embedding").alias("q_emb"))
    # each query probes its n_probe nearest cells
    probed = q.select(
        "query_id",
        "q_emb",
        F.explode(
            F.slice(
                F.reverse(F.array_sort(_sim_structs(F.col("q_emb"), centroids))),
                1,
                n_probe,
            )
        ).alias("p"),
    ).select("query_id", "q_emb", (-F.col("p.nid")).alias("cluster"))
    cand = c.join(F.broadcast(probed), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return (
        cand.select("query_id", "vec_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_train(
    embeddings: DataFrame, n_centroids: int = 16, iters: int = 2
) -> list:
    """Lloyd refinement of the deterministic seed centroids: assign
    every corpus vector to its nearest cell, recompute each centroid as
    the element-wise mean of its members (empty cells keep their
    previous centroid). One shuffle per iteration — posexplode by
    dimension, groupBy(cluster, dim) avg, re-assembled with an ordered
    collect — all JVM. Returns [(centroid_id, [dims])] for
    :func:`ivf_topk`'s ``centroids`` argument.

    Means use float64 partial sums whose order Spark does not fix, so
    trained centroids are *approximately* reproducible (~1 ulp) — use
    the untrained seeds where bit-exact replay matters (the oracle
    contract), trained cells where recall matters."""
    cents = _centroid_seeds(embeddings, n_centroids)
    e = embeddings.select("vec_id", "embedding")
    for _ in range(iters):
        asg = ivf_assign(e, cents)
        means = (
            asg.select("cluster", F.posexplode("embedding").alias("d", "v"))
            .groupBy("cluster", "d")
            .agg(F.avg("v").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "m"))), lambda x: x["m"]
                ).alias("c")
            )
            .collect()
        )
        got = {int(r["cluster"]): [float(v) for v in r["c"]] for r in means}
        cents = [(cid, got.get(cid, vec)) for cid, vec in cents]
    return cents
