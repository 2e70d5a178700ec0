"""Training-data deduplication at scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard.

All hashing is MD5-derived so every operator has a bit-identical ANSI
SQL oracle (DuckDB) — no engine-specific hash functions:

    h_i(s) = substr(md5((i//4) || ':' || s), (i%4)*8+1, 8)
             (8-hex-char string; one md5 yields four 32-bit hash fns;
              lexicographic min == numeric min at fixed width)
    int32(s) = conv(substr(md5(s),1,8), 16, 10)

Scale shapes (100 TB corpus):
- exact: one shuffle on the 128-bit fingerprint (groupBy), map-side
  partial aggregation;
- minhash: signatures are a narrow map-side transform (shingle ->
  transform(seq) -> array_min); LSH banding turns the O(n^2) pair
  problem into groupBy(band_value) joins, each band a separate shuffle
  key space; candidate verification re-checks true Jaccard on the
  shingle sets of candidate pairs only;
- simhash: map-side 64-bit fingerprint (two 32-bit halves so neither
  Spark nor the DuckDB oracle ever overflows a signed long), banded
  into four 16-bit chunks (pigeonhole: a hamming<=3 pair agrees on at
  least one whole band); near-dup = bucket join per band + Hamming
  verify. Expected candidate volume under uniform bucketing is
  bands * C(n,2) / 2^w ~= 4 * n^2/2 / 65536 — at n = 10^9 docs that is
  ~3e13 verify pairs vs ~8e15 for the 8-bit/32-bit variant (256x); at
  n >= 10^10 widen further (e.g. 6 bands of 21 bits from a 128-bit
  fingerprint covers hamming<=5, Manku et al., WWW'07) and/or set
  ``bucket_cap`` to bound any adversarial single-bucket blowup
  (dropped docs are counted and logged — never silently).
  simhash32/simhash_near_duplicates remain as the narrow parity twin.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nutch_spark.ml.text import fingerprint, normalized_text

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _parse_byte_conf(s: str) -> int:
    """'134217728b' / '128m' / '1g' -> bytes (Spark byte-conf syntax)."""
    s = s.strip().lower()
    units = {"tb": 1024**4, "gb": 1024**3, "mb": 1024**2, "kb": 1024,
             "t": 1024**4, "g": 1024**3, "m": 1024**2, "k": 1024, "b": 1}
    for suf in sorted(units, key=len, reverse=True):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * units[suf])
    return int(s)


def _widen_small_scan(df: DataFrame) -> DataFrame:
    """Repartition a too-narrow input before an expensive map-side
    fold. A small parquet table arrives as one input split
    (files.maxPartitionBytes), serializing the per-shingle md5 folds on
    one core; at corpus scale the scan already has >= defaultParallelism
    splits and this is a no-op.

    The probe is metadata-only: inputFiles() + local file sizes. It must
    NOT touch ``df.rdd`` — under AQE that materializes every upstream
    query stage as a real job at plan-construction time. Non-file and
    non-local sources return unchanged (the guard exists for tiny local
    test/bench inputs; a cluster-filesystem scan is already split by the
    file index). Nested calls (near_duplicates -> lsh_candidates) stack
    two adjacent Repartition nodes; Catalyst's CollapseRepartition keeps
    the physical plan at one exchange."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= target:
        return df
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("file", ""):
            return df
        try:
            total += os.path.getsize(unquote(parsed.path))
        except OSError:
            return df
    mpb = _parse_byte_conf(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    )
    est_splits = max(1, -(-total // mpb))
    if est_splits < target:
        return df.repartition(target)
    return df


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Groups of identical normalized text: (fingerprint, doc_ids, keeper).
    Keeper = min doc_id (deterministic)."""
    fp = documents.select(F.col("doc_id"), fingerprint(F.col("text")).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Keep one doc per identical-content group (min doc_id wins)."""
    fp = documents.withColumn("fp", fingerprint(F.col("text")))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fp")
    )


# ---------------------------------------------------------------------------
# shingles + Jaccard
# ---------------------------------------------------------------------------


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams of the normalized text.

    Built by zipping k shifted slices of the word array rather than by
    indexed lookups inside a ``transform`` lambda: Spark evaluates
    higher-order-function lambdas in interpreted mode with no common-
    subexpression elimination, so each ``element_at(words, i)`` inside a
    lambda would re-run the whole normalize+split chain — O(n·L) per
    row. Slices reference the word array a constant k times instead.
    """
    nt = normalized_text(text)
    words = F.split(nt, " ")
    n = F.size(words)
    cnt = n - (k - 1)
    shifted = [F.slice(words, i + 1, cnt) for i in range(k)]
    grams = shifted[0]
    for s in shifted[1:]:
        grams = F.zip_with(grams, s, lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(F.when(n >= k, grams).otherwise(F.array(nt)))


def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.8, k: int = 3
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold. Exact (O(n^2) on the
    shingle-inverted index) — the verification primitive; use
    minhash_lsh_candidates to prune at scale."""
    documents = _widen_small_scan(documents)
    sh = documents.select(
        "doc_id", F.explode(word_shingles(F.col("text"), k)).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    j = inter.join(sa, "doc_a").join(sb, "doc_b")
    jaccard = F.col("n_inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
    )
    return j.select(
        "doc_a", "doc_b", F.round(jaccard, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_fold(shingles: Column, num_hashes: int, finish=None) -> Column:
    """One pass over the shingle array: fold element-wise minima of the
    md5-derived hash slices (module contract above — every hash is an
    md5 hex substring, so lexicographic min == numeric min and DuckDB
    reproduces the signature bit-for-bit).

    Each shingle contributes ceil(num_hashes/4) md5 digests computed
    once in the aggregate *input* (``transform``), concatenated to one
    hex string; h_i is the i-th 8-char slice. Inside the fold lambdas
    only bound variables are referenced, which are cheap value lookups
    (Spark HOF lambdas have no CSE)."""
    n_md5 = (num_hashes + 3) // 4
    hashed = F.transform(
        shingles,
        lambda s: F.concat(*[F.md5(F.concat(F.lit(f"{j}:"), s)) for j in range(n_md5)]),
    )
    init = F.array_repeat(F.lit("g" * 8), num_hashes)  # 'g' > any hex char
    return F.aggregate(
        hashed,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[F.substring(h, i * 8 + 1, 8) for i in range(num_hashes)]),
            lambda a, b: F.least(a, b),
        ),
        finish if finish is not None else (lambda acc: acc),
    )


def minhash_signature(text: Column, num_hashes: int = 16, k: int = 3) -> Column:
    """Array of num_hashes minhashes (8-hex-char strings): h_i = min
    over shingles of substr(md5((i//4) || ':' || shingle), (i%4)*8+1, 8)."""
    return _minhash_fold(word_shingles(text, k), num_hashes)


def minhash_bands(sig: Column, bands: int, rows: int) -> Column:
    """Band values from a *bound* signature array: md5 of `rows`
    consecutive minhashes per band. Prefer ``minhash_band_values`` when
    starting from text — it fuses signature + banding in one pass."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(F.concat_ws(",", F.slice(sig, b * rows + 1, rows))),
    )


def minhash_band_values(text: Column, num_hashes: int, bands: int, k: int = 3) -> Column:
    """Signature + banding fused: the finish lambda sees the signature
    as a bound value, so banding never re-evaluates the minhash fold."""
    if num_hashes % bands != 0:
        # a silent remainder would band only the first bands*(n//bands)
        # hashes — the effective signature/collision probability would
        # differ from the requested parameters without any signal
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}) exactly"
        )
    rows = num_hashes // bands
    return _minhash_fold(
        word_shingles(text, k), num_hashes, finish=lambda sig: minhash_bands(sig, bands, rows)
    )


def _cap_band_buckets(
    bands: DataFrame, bucket_cap: int, op_name: str
) -> DataFrame:
    """Per-(band, value) bucket size cap shared by every banded-LSH
    path: keep the ``bucket_cap`` smallest doc_ids (deterministic) and
    log the count of dropped (doc, band) memberships — a capped bucket
    can miss pairs, never silently. One window over the same
    (band_idx, band_val) keys the bucket join shuffles on anyway; the
    drop count rides the caller's own first action via
    :func:`nutch_spark.ml.capobs.observe_cap_drops` (CollectMetrics),
    so setting a cap costs one pass, not two."""
    import logging

    from nutch_spark.ml.capobs import observe_cap_drops

    w = Window.partitionBy("band_idx", "band_val").orderBy("doc_id")
    ranked = bands.withColumn("_rn", F.row_number().over(w))
    observed = observe_cap_drops(
        ranked,
        "_rn",
        bucket_cap,
        op_name,
        logging.getLogger(__name__),
        "pairs inside oversized buckets beyond the cap are NOT compared",
    )
    return observed.filter(F.col("_rn") <= bucket_cap).drop("_rn")


def minhash_lsh_candidates(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.
    bands*rows == num_hashes; collision prob ≈ 1-(1-j^rows)^bands.

    ``bucket_cap``: optional per-(band, value) bucket size cap with
    logged drops — same contract as ``simhash64_near_duplicates``.
    A boilerplate-heavy corpus (thousands of near-identical docs
    surviving exact dedup into one band bucket) otherwise goes
    quadratic inside that bucket. Size it with
    :func:`nutch_spark.ml.similarity.recommended_bucket_cap` (the
    100-TB default: bounded candidate pairs per doc and in total)."""
    documents = _widen_small_scan(documents)
    banded = documents.select(
        "doc_id",
        F.posexplode(
            minhash_band_values(F.col("text"), num_hashes, bands, k)
        ).alias("band_idx", "band_val"),
    )
    if bucket_cap is not None:
        banded = _cap_band_buckets(banded, bucket_cap, "minhash_lsh_candidates")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_near_duplicates(
    documents: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    bucket_cap: int | None = None,
) -> DataFrame:
    """LSH candidates verified by true Jaccard on shingle sets — the
    standard two-phase near-dup pipeline (prune then verify).
    ``bucket_cap`` threads through to the candidate stage."""
    documents = _widen_small_scan(documents)
    cands = minhash_lsh_candidates(documents, num_hashes, bands, k, bucket_cap)
    sh = documents.select("doc_id", word_shingles(F.col("text"), k).alias("shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    j = cands.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(inter.cast("double") / union, 6)
    return j.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _token_h32(tok: Column) -> Column:
    """32-bit token hash from the md5 hex prefix (portable)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def simhash32(text: Column) -> Column:
    """32-bit SimHash over the normalized words: bit b is 1 iff the sum
    of per-token votes (+1 if token hash has bit b, else -1) is > 0.
    Duplicate tokens vote once per occurrence.

    Single fold over the token-hash array (one md5 per token): the
    accumulator is 33 ints — 32 per-bit one-counts plus the token count
    — and the finish lambda assembles the fingerprint from the bound
    accumulator, so nothing in the chain is re-evaluated."""
    words = F.filter(F.split(normalized_text(text), " "), lambda w: w != "")
    hashes = F.transform(words, _token_h32)
    init = F.array_repeat(F.lit(0), 33)

    def merge(acc: Column, h: Column) -> Column:
        votes = F.array(
            *[
                F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(0)
                for b in range(32)
            ],
            F.lit(1),
        )
        return F.zip_with(acc, votes, lambda a, v: a + v)

    def finish(acc: Column) -> Column:
        n = F.element_at(acc, 33)
        out = F.lit(0).cast("long")
        for b in range(32):
            out = out + F.when(
                F.element_at(acc, b + 1) * 2 > n, F.lit(1 << b).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return out

    return F.aggregate(hashes, init, merge, finish)


def hamming32(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    documents: DataFrame, max_hamming: int = 3, bucket_cap: int | None = None
) -> DataFrame:
    """Near-dups by 32-bit SimHash: band the fingerprint into 4 bytes
    (pigeonhole: hamming<=3 pairs share at least one exact byte),
    bucket-join, verify Hamming distance.

    **Parity twin only — do not use at scale.** 8-bit bands give 256
    buckets per band, so the bucket self-join goes quadratic at >=10^8
    docs (~n^2/128 verify pairs). The production path is
    ``simhash64_near_duplicates`` (four 16-bit bands, 256x fewer
    candidates). ``bucket_cap`` has the same logged-drops contract;
    size it with ``similarity.recommended_bucket_cap``."""
    documents = _widen_small_scan(documents)
    sh = documents.select("doc_id", simhash32(F.col("text")).alias("sh"))
    bands = sh.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(*[F.shiftright(F.col("sh"), 8 * i).bitwiseAND(F.lit(0xFF)) for i in range(4)])
        ).alias("band_idx", "band_val"),
    )
    if bucket_cap is not None:
        bands = _cap_band_buckets(bands, bucket_cap, "simhash_near_duplicates")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming32(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# SimHash64 — the at-scale path (reference parity: lib-nsf/TextMD5Signature
# has no simhash; this is the training-data extension, Manku et al. WWW'07)
# ---------------------------------------------------------------------------


def _token_h64(tok: Column) -> Column:
    """64-bit token hash as two 32-bit halves [lo, hi] from one md5
    (hex chars 1-8 / 9-16). Two longs instead of one 64-bit value so
    neither Spark nor the DuckDB oracle can overflow a signed BIGINT
    (conv of 16 hex digits would)."""
    h = F.md5(tok)
    return F.array(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long"),
    )


def simhash64(text: Column) -> Column:
    """64-bit SimHash as struct(sh_lo, sh_hi): bit b of each half is 1
    iff the per-token majority vote for that bit is positive. Same
    single-fold shape as simhash32 — accumulator is 64 one-counts plus
    the token count; the finish lambda assembles both halves from the
    bound accumulator. Empty/blank text yields (0, 0)."""
    words = F.filter(F.split(normalized_text(text), " "), lambda w: w != "")
    hashes = F.transform(words, _token_h64)
    init = F.array_repeat(F.lit(0), 65)

    def merge(acc: Column, h: Column) -> Column:
        lo = F.element_at(h, 1)
        hi = F.element_at(h, 2)
        votes = F.array(
            *[
                F.when(lo.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(0)
                for b in range(32)
            ],
            *[
                F.when(hi.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(0)
                for b in range(32)
            ],
            F.lit(1),
        )
        return F.zip_with(acc, votes, lambda a, v: a + v)

    def finish(acc: Column) -> Column:
        n = F.element_at(acc, 65)

        def half(off: int) -> Column:
            out = F.lit(0).cast("long")
            for b in range(32):
                out = out + F.when(
                    F.element_at(acc, off + b + 1) * 2 > n,
                    F.lit(1 << b).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            return out

        return F.struct(half(0).alias("sh_lo"), half(32).alias("sh_hi"))

    return F.aggregate(hashes, init, merge, finish)


def hamming64(a_lo: Column, a_hi: Column, b_lo: Column, b_hi: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints held as 32-bit
    halves: xor+popcount per half, summed."""
    return F.bit_count(a_lo.bitwiseXOR(b_lo)) + F.bit_count(a_hi.bitwiseXOR(b_hi))


def simhash64_near_duplicates(
    documents: DataFrame,
    max_hamming: int = 3,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-dups by 64-bit SimHash: four 16-bit bands (pigeonhole —
    any hamming<=3 pair leaves at least one of the four bands
    untouched, so it collides on that band's exact value), bucket join
    per band, Hamming verify on the survivors.

    Scale bound (uniform buckets): expected verify pairs ~=
    bands * n^2/2 / 2^16. At n=10^9 that is ~3e13 — tractable as a
    shuffle-partitioned join; the 8-bit/32-bit twin would produce
    ~8e15. For n >= 10^10 widen the fingerprint/bands further or set
    ``bucket_cap``.

    ``bucket_cap``: optional per-(band, value) bucket size cap for
    adversarial/degenerate corpora (e.g. millions of empty docs all
    fingerprinting to 0). Buckets larger than the cap keep the
    ``bucket_cap`` smallest doc_ids (deterministic) and the number of
    dropped (doc, band) memberships is counted and logged — a capped
    bucket can miss pairs, never silently: the count is in the log and
    the cap is the caller's explicit opt-in. Size it with
    ``similarity.recommended_bucket_cap``.
    """
    documents = _widen_small_scan(documents)
    sh = documents.select("doc_id", simhash64(F.col("text")).alias("s")).select(
        "doc_id", F.col("s.sh_lo").alias("sh_lo"), F.col("s.sh_hi").alias("sh_hi")
    )
    chunks = [
        F.shiftright(F.col("sh_lo"), 0).bitwiseAND(F.lit(0xFFFF)),
        F.shiftright(F.col("sh_lo"), 16).bitwiseAND(F.lit(0xFFFF)),
        F.shiftright(F.col("sh_hi"), 0).bitwiseAND(F.lit(0xFFFF)),
        F.shiftright(F.col("sh_hi"), 16).bitwiseAND(F.lit(0xFFFF)),
    ]
    bands = sh.select(
        "doc_id",
        "sh_lo",
        "sh_hi",
        F.posexplode(F.array(*chunks)).alias("band_idx", "band_val"),
    )
    if bucket_cap is not None:
        bands = _cap_band_buckets(bands, bucket_cap, "simhash64_near_duplicates")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming64(
                F.col("a.sh_lo"), F.col("a.sh_hi"), F.col("b.sh_lo"), F.col("b.sh_hi")
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
