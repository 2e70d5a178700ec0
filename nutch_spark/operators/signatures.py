"""Content signatures (T12/T13) beyond the parse stage's span MD5.

- ``md5_signature`` — MD5Signature (``crawl/MD5Signature.java:33-38``):
  MD5 of the content bytes, of the URL when content is empty.
- ``text_profile_signature`` — TextProfileSignature
  (``crawl/TextProfileSignature.java:87-161``), fully JVM-side:

  1. tokenize: maximal alnum runs, lowercased, keep length > 2
     (MIN_TOKEN_LEN, :71,102);
  2. count per token; QUANT = round(maxFreq · quant_rate 0.01), clamped
     to 2 when maxFreq > 1 else 1 (:135-141);
  3. quantize counts down to multiples of QUANT, discard counts < QUANT
     (:143-149);
  4. profile = tokens sorted by count desc then value asc
     (TokenComparator :178-190), rendered "val cnt" joined by "\\n"
     (Token.toString :172-175);
  5. signature = MD5(profile).

All arithmetic is integer except QUANT's round, mirrored exactly. No
Python in the path — explode + groupBy + array_sort, so it scales as an
ordinary aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_signature(content: Column, url: Column) -> Column:
    """MD5Signature: md5(content), md5(url) when content empty/null."""
    return F.when(
        content.isNotNull() & (F.length(content) > 0), F.md5(content)
    ).otherwise(F.md5(url))


def text_profile_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quant_rate: float = 0.01,
    min_token_len: int = 2,
) -> DataFrame:
    """Returns (id_col, signature) — one row per input row."""
    # Unicode letter-or-digit runs, exactly Character.isLetterOrDigit
    # (TextProfileSignature.java:96-116: isLetter = \p{L}, isDigit =
    # \p{Nd}) — an ASCII-only [a-z0-9] would shred 'café' into
    # 'caf' and collide accented variants onto one signature
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.filter(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(r"[\p{L}\p{Nd}]+"), 0
                ),
                lambda t: F.length(t) > min_token_len,
            )
        ).alias("tok"),
    )
    counts = toks.groupBy(id_col, "tok").agg(F.count("tok").alias("cnt"))
    # Math.round(maxFreq * 0.01f) with the <2 clamp (:135-141)
    from pyspark.sql import Window

    w = Window.partitionBy(id_col)
    counts = counts.withColumn("maxf", F.max("cnt").over(w))
    quant_raw = F.floor(F.col("maxf") * F.lit(quant_rate) + F.lit(0.5)).cast("long")
    quant = (
        F.when(quant_raw >= 2, quant_raw)
        .when(F.col("maxf") > 1, F.lit(2))
        .otherwise(F.lit(1))
    )
    counts = counts.withColumn("q", quant).withColumn(
        "qcnt", (F.col("cnt") / F.col("q")).cast("long") * F.col("q")
    )
    kept = counts.filter(F.col("qcnt") >= F.col("q"))
    profile = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("qcnt")).alias("neg"), F.col("tok")))
                ),
                lambda s: F.concat(s["tok"], F.lit(" "), (-s["neg"]).cast("string")),
            ),
            "\n",
        ).alias("profile")
    )
    # rows whose every token quantized away (or empty text) hash ""
    base = df.select(F.col(id_col)).distinct()
    return base.join(profile, id_col, "left").select(
        id_col,
        F.md5(F.coalesce("profile", F.lit(""))).alias("signature"),
    )
