"""bin/nutch-style command dispatcher over parquet table directories.

The reference exposes each crawl stage as a CLI subcommand
(``src/bin/nutch``); this is the same operational surface on Spark so
a reference user can run their existing playbook verbatim:

    python tools/nutch.py inject   crawldb/ seeds.txt
    python tools/nutch.py generate crawldb/ fetchlist/ --top-n 50000 --num-lists 8
    python tools/nutch.py updatedb crawldb/ segment_rows/
    python tools/nutch.py readdb   crawldb/ -stats
    python tools/nutch.py readdb   crawldb/ -topN 10
    python tools/nutch.py readdb   crawldb/ -dump out/ [--status N] [--regex R]
    python tools/nutch.py mergedb  out/ db1/ db2/ ...
    python tools/nutch.py invertlinks linkdb/ outlinks/
    python tools/nutch.py readseg  -list wh/segment_0001 [...]
    python tools/nutch.py readseg  wh/segment_0001 -dump out/ | -get URL
    python tools/nutch.py dedup    crawldb/
    python tools/nutch.py hostdb   crawldb/ hostdb/
    python tools/nutch.py normalizerchecker 'http://WWW.Ex.COM:80/a/../b'
    python tools/nutch.py filterchecker 'https://example.com/x'

Tables are parquet directories (the SnapshotCatalog wraps the same
operators for versioned/resumable production use — crawl_loop.py);
every subcommand is a thin shell over the operator modules, so command
semantics and scale behavior are exactly the library's.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nutch_spark.config import NutchConfig  # noqa: E402


def _install(tmp: str, target: str) -> None:
    """CrawlDb.install semantics: the previous table is renamed aside
    BEFORE the new one moves in, so a crash between steps leaves either
    the old db or both — never neither. (A bare rmtree-then-replace has
    a window where the live frontier is simply gone.)"""
    import shutil

    old = target.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    had_old = os.path.exists(target)
    if had_old:
        os.replace(target, old)
    os.replace(tmp, target)
    if had_old:
        shutil.rmtree(old)


def _spark():
    from nutch_spark.session import get_spark

    return get_spark(
        master=os.environ.get("NUTCH_SPARK_MASTER", "local[*]"),
        shuffle_partitions=int(os.environ.get("NUTCH_SPARK_SHUFFLE", "32")),
    )


def _now(args) -> int:
    return args.now_ms


def _read(spark, path):
    return spark.read.parquet(path)


def _write(df, path):
    df.write.mode("overwrite").parquet(path)


def cmd_inject(args) -> int:
    from nutch_spark.operators.inject import inject_full

    spark = _spark()
    cfg = NutchConfig()
    db = _read(spark, args.crawldb) if os.path.exists(args.crawldb) else None
    out = inject_full(spark, db, args.seeds, cfg, _now(args))
    # write-then-swap semantics belong to the catalog; plain CLI mode
    # writes to a temp dir then replaces, mirroring CrawlDb.install
    tmp = args.crawldb.rstrip("/") + ".tmp"
    _write(out, tmp)
    _install(tmp, args.crawldb)
    print(f"inject: crawldb now {_read(spark, args.crawldb).count()} urls")
    return 0


def cmd_generate(args) -> int:
    from nutch_spark.operators.generate import generate

    spark = _spark()
    cfg = NutchConfig()
    fl = generate(
        _read(spark, args.crawldb), cfg, _now(args),
        top_n=args.top_n, num_lists=args.num_lists,
    )
    _write(fl, args.out)
    print(f"generate: {_read(spark, args.out).count()} urls in fetchlist")
    return 0


def cmd_updatedb(args) -> int:
    from nutch_spark.operators.updatedb import updatedb

    spark = _spark()
    cfg = NutchConfig()
    db = _read(spark, args.crawldb) if os.path.exists(args.crawldb) else None
    out = updatedb(db, _read(spark, args.segment), cfg, _now(args))
    tmp = args.crawldb.rstrip("/") + ".tmp"
    _write(out, tmp)
    _install(tmp, args.crawldb)
    print(f"updatedb: crawldb now {_read(spark, args.crawldb).count()} urls")
    return 0


def cmd_readdb(args) -> int:
    from nutch_spark.operators import stats

    spark = _spark()
    db = _read(spark, args.crawldb)
    if args.stats:
        for r in stats.crawldb_stats(db).collect():
            print(r.asDict())
    elif args.topN is not None:
        df = stats.top_n(db, args.topN)
        if args.out:
            _write(df, args.out)
        for r in df.collect():
            print(r["url"], r["score"])
    elif args.dump:
        df = stats.dump(db, status=args.status, regex=args.regex)
        _write(df, args.dump)
        # count the WRITTEN parquet (metadata-only) — counting df would
        # re-run the whole filtered scan a second time
        print(f"readdb: dumped {_read(spark, args.dump).count()} rows to {args.dump}")
    elif args.url:
        for r in stats.read_url(db, args.url).collect():
            print(r.asDict())
    else:
        print("readdb: one of -stats/-topN/-dump/-url required", file=sys.stderr)
        return 2
    return 0


def cmd_mergedb(args) -> int:
    from nutch_spark.operators.merger import merge_crawldbs

    spark = _spark()
    cfg = NutchConfig()
    out = merge_crawldbs([_read(spark, p) for p in args.dbs], cfg)
    _write(out, args.out)
    print(f"mergedb: {_read(spark, args.out).count()} urls")
    return 0


def cmd_invertlinks(args) -> int:
    from nutch_spark.operators.linkdb import invert_links, merge_linkdbs

    spark = _spark()
    cfg = NutchConfig()
    new = invert_links(_read(spark, args.outlinks), cfg)
    existing = (
        _read(spark, args.linkdb) if os.path.exists(args.linkdb) else None
    )
    out = merge_linkdbs(existing, new, cfg)
    tmp = args.linkdb.rstrip("/") + ".tmp"
    _write(out, tmp)
    _install(tmp, args.linkdb)
    print(f"invertlinks: linkdb now {_read(spark, args.linkdb).count()} targets")
    return 0


def cmd_readlinkdb(args) -> int:
    """LinkDbReader (``crawl/LinkDbReader.java:154-231``): -dump with
    optional -regex on the target url, or -url for one target's
    inlinks. Same parquet-table convention as readdb."""
    from pyspark.sql import functions as F

    spark = _spark()
    db = _read(spark, args.linkdb)
    if args.dump:
        df = db
        if args.regex:
            # LinkDbReader.java:134-151 screens the KEY (target url)
            df = df.filter(F.col("url").rlike(args.regex))
        _write(df, args.dump)
        print(f"readlinkdb: dumped {_read(spark, args.dump).count()} targets to {args.dump}")
    elif args.url:
        rows = db.filter(F.col("url") == args.url).collect()
        if not rows:
            print(f"no link information for {args.url}")
        for r in rows:
            for il in r["inlinks"]:
                print(f"fromUrl: {il['from_url']} anchor: {il['anchor']}")
    else:
        print("readlinkdb: one of -dump/-url required", file=sys.stderr)
        return 2
    return 0


def cmd_dedup(args) -> int:
    from nutch_spark.operators.dedup import dedup

    spark = _spark()
    cfg = NutchConfig()
    out = dedup(_read(spark, args.crawldb), cfg)
    tmp = args.crawldb.rstrip("/") + ".tmp"
    _write(out, tmp)
    _install(tmp, args.crawldb)
    print("dedup: done")
    return 0


def cmd_hostdb(args) -> int:
    from nutch_spark.operators.stats import hostdb_update

    spark = _spark()
    cfg = NutchConfig()
    out = hostdb_update(_read(spark, args.crawldb), cfg)
    _write(out, args.hostdb)
    print(f"hostdb: {_read(spark, args.hostdb).count()} hosts")
    return 0


def cmd_parsechecker(args) -> int:
    """ParserChecker: parse a local file as the given URL and print
    title/text/outlinks (html via tag strip + href resolve, plain text
    via the OutlinkExtractor regex)."""
    from pyspark.sql import functions as F

    from nutch_spark.operators.feed import strip_tags
    from nutch_spark.operators.js_parse import resolve_url
    from nutch_spark.operators.parse import text_outlinks

    spark = _spark()
    raw = open(args.file, "rb").read().decode("utf-8", "replace")
    df = spark.createDataFrame([(args.url, raw)], "url string, content string")
    is_html = "<" in raw and ">" in raw
    if is_html:
        row = df.select(
            strip_tags(
                F.regexp_extract("content", "(?is)<title>(.*?)</title>", 1)
            ).alias("title"),
            strip_tags(F.col("content")).alias("text"),
            F.transform(
                F.regexp_extract_all(
                    "content", F.lit('(?i)<a[^>]*href="([^"]*)"'), 1
                ),
                lambda h: resolve_url(F.col("url"), h),
            ).alias("outlinks"),
        ).first()
        title, text, links = row["title"], row["text"], row["outlinks"]
    else:
        title = raw.splitlines()[0][:80] if raw else ""
        text = raw
        links = [
            r["to_url"]
            for r in text_outlinks(
                df.select("url", F.col("content").alias("text"))
            ).collect()
        ]
    print(f"Title: {title}")
    print(f"Text: {text[:200]}")
    print(f"Outlinks: {len(links)}")
    for l in links:
        print(f"  outlink: {l}")
    return 0


def cmd_indexchecker(args) -> int:
    """IndexingFiltersChecker: parsechecker + the indexable fields."""
    from pyspark.sql import functions as F

    from nutch_spark.operators.feed import strip_tags
    from nutch_spark.operators.index_filters import detect_mime_by_url
    from nutch_spark.ml.text import quality_score
    from nutch_spark.urls.urlutil import host_col

    spark = _spark()
    raw = open(args.file, "rb").read().decode("utf-8", "replace")
    df = spark.createDataFrame([(args.url, raw)], "url string, content string")
    text = F.when(
        F.lit("<" in raw), strip_tags(F.col("content"))
    ).otherwise(F.col("content"))
    row = df.select(
        F.col("url").alias("id"),
        host_col(F.col("url")).alias("host"),
        detect_mime_by_url(F.col("url")).alias("type"),
        F.substring(text, 1, 100).alias("title"),
        F.substring(text, 1, 10000).alias("content"),
        F.md5("content").alias("digest"),
    ).first()
    for k, v in row.asDict().items():
        print(f"{k} :\t{str(v)[:120]}")
    q = df.select(quality_score(text).alias("q")).first()["q"]
    print(f"quality :\t{q}")
    return 0


# SegmentReader parts (segment/SegmentReader.java:66-74) — ours are the
# parquet tables crawl_loop commits per cycle; crawl_generate/content
# only exist when a caller staged them (bench does), and a missing part
# prints '?' exactly like the reference's per-part flags
_SEG_PARTS = (
    "crawl_generate", "crawl_fetch", "content",
    "crawl_parse", "parse_data", "parse_text", "parse_meta",
)


def _seg_part(seg: str, part: str) -> str | None:
    """Resolve one segment part dir: ``<seg>/<part>`` (reference
    layout) or ``<seg>_<part>`` (catalog table naming)."""
    for cand in (os.path.join(seg, part), seg.rstrip("/") + "_" + part):
        if os.path.isdir(cand):
            return cand
    return None


def _fmt_ms(ms) -> str:
    import datetime as dt

    if ms is None:
        return "?"
    return dt.datetime.fromtimestamp(ms / 1000, dt.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S"
    )


def cmd_readseg(args) -> int:
    """SegmentReader (``segment/SegmentReader.java:494-614``): -list
    prints the reference's NAME/GENERATED/FETCHER START/END/FETCHED/
    PARSED line per segment ('?' for absent parts); -dump writes a
    url-sorted text rendering of every part record (datum/parse rows as
    JSON — the operational equivalent of CrawlDatum.toString()); -get
    prints one URL's records across all parts. Fetcher start/end are
    UTC (the reference formats in local time)."""
    from pyspark.sql import functions as F

    if not (args.list or args.dump or args.get):
        print("readseg: one of -list/-dump/-get required", file=sys.stderr)
        return 2
    spark = _spark()
    if args.list:
        print("NAME\t\tGENERATED\tFETCHER START\t\tFETCHER END\t\tFETCHED\tPARSED")
        for seg in args.segments:
            gen = fetched = parsed = start = end = None
            part = _seg_part(seg, "crawl_generate")
            if part:
                gen = _read(spark, part).count()
            part = _seg_part(seg, "crawl_fetch")
            if part:
                fetched, start, end = _read(spark, part).agg(
                    F.count("*"), F.min("fetch_time"), F.max("fetch_time")
                ).collect()[0]
            part = _seg_part(seg, "parse_data") or _seg_part(seg, "parse_text")
            if part:
                parsed = _read(spark, part).count()
            name = os.path.basename(seg.rstrip("/"))
            print(
                f"{name}\t{gen if gen is not None else '?'}\t\t"
                f"{_fmt_ms(start)}\t{_fmt_ms(end)}\t"
                f"{fetched if fetched is not None else '?'}\t"
                f"{parsed if parsed is not None else '?'}"
            )
        return 0

    seg = args.segments[0]
    sections = []
    for part in _SEG_PARTS:
        path = _seg_part(seg, part)
        if not path:
            continue
        df = _read(spark, path)
        label = {
            "crawl_generate": "CrawlDatum::",
            "crawl_fetch": "CrawlDatum::",
            "crawl_parse": "CrawlDatum::",
            "content": "Content::",
            "parse_data": "ParseData::",
            "parse_text": "ParseText::",
            "parse_meta": "ParseMeta::",
        }[part]
        body = (
            F.col("text")
            if part == "parse_text"
            else F.to_json(F.struct(*[c for c in df.columns if c != "url"]))
        )
        sections.append(
            df.select(
                "url",
                F.concat(F.lit(f"{part} {label}\n"), body).alias("section"),
            )
        )
    if not sections:
        print(f"readseg: no segment parts found under {seg}", file=sys.stderr)
        return 2
    union = sections[0]
    for s_ in sections[1:]:
        union = union.unionByName(s_)

    if args.get:
        rows = union.filter(F.col("url") == args.get).collect()
        if not rows:
            print(f"readseg: no records for {args.get}")
            return 0
        print(f"URL:: {args.get}")
        for r in sorted(rows, key=lambda r: r["section"]):
            print(r["section"])
        return 0

    # -dump: per-url record groups in url order (the reference's
    # sorted-key dump), one text part per output split
    out = (
        union.groupBy("url")
        .agg(F.array_sort(F.collect_list("section")).alias("secs"))
        .select(
            F.concat(
                F.lit("URL:: "), F.col("url"), F.lit("\n"),
                F.array_join("secs", "\n"),
            ).alias("value")
        )
        .orderBy("value")
    )
    out.write.mode("overwrite").text(args.dump)
    print(f"readseg: dumped {_read_text_count(spark, args.dump)} records to {args.dump}")
    return 0


def _read_text_count(spark, path: str) -> int:
    from pyspark.sql import functions as F

    return (
        spark.read.text(path)
        .filter(F.col("value").startswith("URL:: "))
        .count()
    )


def cmd_normalizerchecker(args) -> int:
    from nutch_spark.urls.normalizer import normalize

    out = normalize(args.url, scope=args.scope)
    print(out if out is not None else "<rejected>")
    return 0


def cmd_filterchecker(args) -> int:
    from nutch_spark.urls.filters import default_filter

    ok = default_filter().accept(args.url)
    print(f"{'+' if ok else '-'}{args.url}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="nutch", description=__doc__)
    p.add_argument("--now-ms", type=int, default=1_704_000_000_000,
                   help="injected clock (determinism)")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("inject")
    s.add_argument("crawldb"); s.add_argument("seeds")
    s.set_defaults(fn=cmd_inject)

    s = sub.add_parser("generate")
    s.add_argument("crawldb"); s.add_argument("out")
    s.add_argument("--top-n", type=int, default=50_000)
    s.add_argument("--num-lists", type=int, default=1)
    s.set_defaults(fn=cmd_generate)

    s = sub.add_parser("updatedb")
    s.add_argument("crawldb"); s.add_argument("segment")
    s.set_defaults(fn=cmd_updatedb)

    s = sub.add_parser("readdb")
    s.add_argument("crawldb")
    s.add_argument("-stats", action="store_true", dest="stats")
    s.add_argument("-topN", type=int, default=None, dest="topN")
    s.add_argument("-dump", default=None, dest="dump")
    s.add_argument("-url", default=None, dest="url")
    s.add_argument("--out", default=None)
    s.add_argument("--status", type=int, default=None)
    s.add_argument("--regex", default=None)
    s.set_defaults(fn=cmd_readdb)

    s = sub.add_parser("mergedb")
    s.add_argument("out"); s.add_argument("dbs", nargs="+")
    s.set_defaults(fn=cmd_mergedb)

    s = sub.add_parser("invertlinks")
    s.add_argument("linkdb"); s.add_argument("outlinks")
    s.set_defaults(fn=cmd_invertlinks)

    s = sub.add_parser("readlinkdb")
    s.add_argument("linkdb")
    s.add_argument("-dump", dest="dump")
    s.add_argument("-regex", dest="regex")
    s.add_argument("-url", dest="url")
    s.set_defaults(fn=cmd_readlinkdb)

    s = sub.add_parser("dedup")
    s.add_argument("crawldb")
    s.set_defaults(fn=cmd_dedup)

    s = sub.add_parser("hostdb")
    s.add_argument("crawldb"); s.add_argument("hostdb")
    s.set_defaults(fn=cmd_hostdb)

    s = sub.add_parser("parsechecker")
    s.add_argument("file"); s.add_argument("--url", default="http://example.com/")
    s.set_defaults(fn=cmd_parsechecker)

    s = sub.add_parser("indexchecker")
    s.add_argument("file"); s.add_argument("--url", default="http://example.com/")
    s.set_defaults(fn=cmd_indexchecker)

    s = sub.add_parser("readseg")
    s.add_argument("segments", nargs="+",
                   help="segment dir(s) or catalog table prefix(es)")
    s.add_argument("-list", action="store_true", dest="list")
    s.add_argument("-dump", default=None, dest="dump")
    s.add_argument("-get", default=None, dest="get")
    s.set_defaults(fn=cmd_readseg)

    s = sub.add_parser("normalizerchecker")
    s.add_argument("url"); s.add_argument("--scope", default="default")
    s.set_defaults(fn=cmd_normalizerchecker)

    s = sub.add_parser("filterchecker")
    s.add_argument("url")
    s.set_defaults(fn=cmd_filterchecker)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
