"""URL-seen membership structures (north rule: bloom/cuckoo URL-seen).

The CrawlDb itself is the *exact* URL-seen set (groupBy(url) in
updatedb, as in the reference where the CrawlDb MapFile is the seen
set). These structures are **accelerators**: probabilistic pre-filters
whose false positives are always resolved by an exact operator
downstream, so exactness is preserved while shuffle volume collapses.

Two implementations, same contract:

- ``FingerprintSet`` (default): broadcast the distinct ``xxhash64(url)``
  values of the small side and split the big side with broadcast
  semi/anti hash-joins — JVM-side, zero Python. 8 bytes/url; morally a
  cuckoo filter (64-bit fingerprint table). A 64-bit collision behaves
  exactly like a bloom false positive (row takes the slow exact path).
- ``BloomBitmap``: k-hash bloom bitmap built distributively (bit_or
  aggregation over 64-bit word partials; the driver only materializes
  the non-zero words, never raw positions), broadcast as bytes, probed
  by an Arrow-vectorized numpy UDF. ~1.2 bytes/url at 1% fpp — for
  when the small side reaches 10^8+ urls and 8 bytes/url no longer
  broadcasts.

Used by ``operators.updatedb.updatedb_incremental``: the 10^10-row
CrawlDb is split into touched (might be in the segment) and untouched
(provably not in the segment — no false negatives) partitions; only the
touched slice enters the merge shuffle, the untouched slice passes
through without moving.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class FingerprintSet:
    """Broadcast 64-bit fingerprint membership (exact split on hashes)."""

    def __init__(self, small: DataFrame, url_col: str = "url"):
        self._fp = (
            small.select(F.xxhash64(url_col).alias("_fp")).distinct()
        )

    def split(self, big: DataFrame, url_col: str = "url") -> tuple[DataFrame, DataFrame]:
        """Returns (maybe_member, not_member); they partition ``big``."""
        fp = F.broadcast(self._fp)
        h = F.xxhash64(url_col)
        maybe = big.join(fp, h == F.col("_fp"), "left_semi")
        definitely_not = big.join(fp, h == F.col("_fp"), "left_anti")
        return maybe, definitely_not


class BloomBitmap:
    """Classic k-hash bloom bitmap; built by a distributed bit_or
    aggregation over word-indexed partials, probed via Arrow numpy."""

    def __init__(
        self,
        small: DataFrame,
        url_col: str = "url",
        expected_items: int | None = None,
        fpp: float = 0.01,
        num_hashes: int = 5,
    ):
        if expected_items is None:
            expected_items = small.count() or 1
        # m = -n ln p / (ln 2)^2, rounded up to whole long words
        m = int(-expected_items * np.log(fpp) / (np.log(2) ** 2)) + 64
        m = ((m + 63) // 64) * 64
        self.m = m
        self.k = num_hashes
        # distributed build: per-word bit_or partials (one groupBy on the
        # 64-bit word index, map-side combined — no distinct shuffle, no
        # collect() of O(k*n) raw positions). The driver materializes
        # only the non-zero words: <= m/64 rows of 16 bytes, i.e. the
        # same order as the bitmap it must hold to broadcast anyway.
        pos = small.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(url_col, F.lit(i)), F.lit(m))
                        for i in range(num_hashes)
                    ]
                )
            ).alias("p")
        )
        words = (
            pos.select(
                F.expr("p DIV 64").alias("w"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
            )
            .groupBy("w")
            .agg(F.bit_or("b").alias("mask"))
        )
        pdf = words.toPandas()
        # explicit byte extraction (no int64 .view — that would bake the
        # driver's endianness into the byte layout the probe UDF reads):
        # bit p lives in byte p//8 at bit p%8, always
        bits = np.zeros(m // 8, dtype=np.uint8)
        if len(pdf):
            w = pdf["w"].to_numpy().astype(np.int64)
            masks = pdf["mask"].to_numpy().astype(np.uint64)
            for s in range(8):
                bits[w * 8 + s] = (masks >> np.uint64(8 * s)) & np.uint64(0xFF)
        self._bits = bits

    def might_contain_udf(self):
        bits, m, k = self._bits, self.m, self.k

        @F.pandas_udf("boolean")
        def _mc(hcols: pd.DataFrame) -> pd.Series:
            out = np.ones(len(hcols), dtype=bool)
            for c in hcols.columns:
                p = hcols[c].to_numpy()
                out &= (bits[p // 8] & (1 << (p % 8)).astype(np.uint8)) != 0
            return pd.Series(out)

        return _mc

    def split(self, big: DataFrame, url_col: str = "url") -> tuple[DataFrame, DataFrame]:
        probe = F.struct(
            *[
                F.pmod(F.xxhash64(url_col, F.lit(i)), F.lit(self.m)).alias(f"h{i}")
                for i in range(self.k)
            ]
        )
        mc = self.might_contain_udf()(probe)
        return big.filter(mc), big.filter(~mc)
