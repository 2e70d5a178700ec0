"""DmozParser: DMOZ/ODP RDF dumps as a seed-list source.

Re-expresses ``tools/DmozParser.java:121-320``: walk the RDF stream
keeping the current ``<Topic r:id>`` section; each ``<ExternalPage
about=URL>`` is emitted as a seed when it passes (1) the adult filter —
sections under ``Top/Adult`` are skipped unless ``include_adult``
(``:158-160``), (2) the optional topic regex, matched against the FULL
section id (``Pattern.matches``, ``:162-164``), and (3) the subset
sampler: emit iff ``abs(quarterDigest(md5(url)) ^ skew) % denom == 0``
(``:168-171``; Hadoop ``MD5Hash.hashCode`` = big-endian first four
digest bytes). The page's ``d:Title``/``d:Description`` children ride
along (the reference prints them for linkdb anchor use).

Spark-first: the section-state walk becomes ``split`` on the Topic
open tag + ``posexplode`` — each fragment carries exactly one section
id, so no cross-row state is needed; page extraction and the subset
hash are JVM columns. The quarter-digest is computed from md5 hex via
per-nibble ``instr`` arithmetic — deliberately engine-portable so the
ANSI-SQL oracle replays the exact same sampler bit-for-bit.

Scale: RDF dumps split per file/chunk; everything is map-side — the
one caution is that a single giant RDF string row is unsplittable, so
feed chunked files (as the reference's 9 GB content.rdf.u8 would be).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def md5_quarter_digest(url: Column) -> Column:
    """Hadoop MD5Hash.hashCode(): signed int32 from the first four md5
    digest bytes, big-endian — as a LongType for overflow-free xor."""
    h = F.md5(url)
    val = F.lit(0).cast("long")
    for k in range(1, 9):
        nib = F.instr(F.lit(_HEX), F.substring(h, k, 1)) - 1
        val = val + nib.cast("long") * F.lit(16 ** (8 - k)).cast("long")
    # unsigned 32-bit -> Java signed int
    return F.when(val >= F.lit(2**31), val - F.lit(2**32)).otherwise(val)


def xml_unescape(c: Column) -> Column:
    """Predefined-entity decode (the SAX reader hands DmozParser decoded
    attribute/character data; ``&amp;`` last so double-escapes survive)."""
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def subset_keep(url: Column, denom: int, skew: int) -> Column:
    """DmozParser.java:168-171 emit condition."""
    if denom <= 1:
        return F.lit(True)
    v = md5_quarter_digest(url).bitwiseXOR(F.lit(int(skew)).cast("long"))
    return (F.abs(v) % denom) == 0


def parse_dmoz(
    rdf: DataFrame,
    *,
    content_col: str = "content",
    subset_denom: int = 1,
    skew: int = 0,
    include_adult: bool = False,
    topic_pattern: str | None = None,
) -> DataFrame:
    """(url, topic, title, description) seed rows from RDF documents."""
    frag = F.col("_frag")
    section = F.regexp_extract(frag, '^r:id="([^"]*)"', 1)
    pieces = rdf.select(
        F.explode(F.split(F.col(content_col), "<Topic ")).alias("_frag")
    ).filter(frag.startswith('r:id="'))

    block = F.col("_page")
    pages = pieces.select(
        section.alias("topic"),
        F.explode(
            F.regexp_extract_all(
                frag,
                F.lit('(?s)<ExternalPage about="[^"]*">.*?</ExternalPage>'),
                0,
            )
        ).alias("_page"),
    ).select(
        # decode entities BEFORE the subset hash — the reference hashes
        # the SAX-decoded about= value
        xml_unescape(F.regexp_extract(block, 'about="([^"]*)"', 1)).alias("url"),
        "topic",
        xml_unescape(
            F.regexp_extract(block, "(?s)<d:Title>(.*?)</d:Title>", 1)
        ).alias("title"),
        xml_unescape(
            F.regexp_extract(block, "(?s)<d:Description>(.*?)</d:Description>", 1)
        ).alias("description"),
    )
    if not include_adult:
        pages = pages.filter(~F.col("topic").startswith("Top/Adult"))
    if topic_pattern is not None:
        # Pattern.matches = full-string match
        pages = pages.filter(F.col("topic").rlike(f"^(?:{topic_pattern})$"))
    return pages.filter(subset_keep(F.col("url"), subset_denom, skew))
