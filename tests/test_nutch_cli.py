"""bin/nutch-style CLI dispatcher: a reference user's playbook —
inject, generate, readdb, mergedb, checkers — runs end-to-end over
parquet table dirs (tools/nutch.py)."""

import sys

sys.path.insert(0, "tools")

import nutch as nutch_cli  # noqa: E402


def test_inject_generate_readdb_roundtrip(spark, tmp_path, capsys):
    seeds = tmp_path / "seeds.txt"
    seeds.write_text(
        "http://a.example.com/\n"
        "# a comment\n"
        "http://b.example.com/\tnutch.score=2.0\n"
    )
    db = str(tmp_path / "crawldb")
    assert nutch_cli.main(["inject", db, str(seeds)]) == 0
    assert "2 urls" in capsys.readouterr().out

    fl = str(tmp_path / "fetchlist")
    assert nutch_cli.main(["generate", db, fl, "--top-n", "10"]) == 0
    assert "2 urls" in capsys.readouterr().out

    assert nutch_cli.main(["readdb", db, "-stats"]) == 0
    out = capsys.readouterr().out
    assert "db_unfetched" in out

    assert nutch_cli.main(["readdb", db, "-topN", "1"]) == 0
    # nutch.score=2.0 makes b the top-scored url
    assert "http://b.example.com/" in capsys.readouterr().out


def test_mergedb_and_checkers(spark, tmp_path, capsys):
    s1, s2 = tmp_path / "s1.txt", tmp_path / "s2.txt"
    s1.write_text("http://a.example.com/\n")
    s2.write_text("http://c.example.com/\n")
    d1, d2 = str(tmp_path / "db1"), str(tmp_path / "db2")
    nutch_cli.main(["inject", d1, str(s1)])
    nutch_cli.main(["inject", d2, str(s2)])
    capsys.readouterr()
    out_db = str(tmp_path / "merged")
    assert nutch_cli.main(["mergedb", out_db, d1, d2]) == 0
    assert "2 urls" in capsys.readouterr().out

    assert nutch_cli.main(
        ["normalizerchecker", "HTTP://WWW.Example.COM:80/a/../b.html"]
    ) == 0
    assert capsys.readouterr().out.strip() == "http://www.example.com/b.html"

    assert nutch_cli.main(["filterchecker", "https://ok.example.com/x"]) == 0
    assert capsys.readouterr().out.strip() == "+https://ok.example.com/x"
    assert nutch_cli.main(["filterchecker", "ftp://no.example.com/x"]) == 0
    assert capsys.readouterr().out.strip() == "-ftp://no.example.com/x"


def test_parsechecker_and_indexchecker(spark, tmp_path, capsys):
    page = tmp_path / "page.html"
    page.write_text(
        "<html><head><title>My <b>Page</b></title></head>"
        '<body><a href="/next.html">next</a>Hello world</body></html>'
    )
    assert nutch_cli.main(
        ["parsechecker", str(page), "--url", "http://h.example.com/a/page.html"]
    ) == 0
    out = capsys.readouterr().out
    assert "Title: My Page" in out
    assert "outlink: http://h.example.com/next.html" in out

    txt = tmp_path / "plain.txt"
    txt.write_text("Read http://link.example.org/x and more")
    assert nutch_cli.main(["parsechecker", str(txt)]) == 0
    assert "outlink: http://link.example.org/x" in capsys.readouterr().out

    assert nutch_cli.main(
        ["indexchecker", str(page), "--url", "http://h.example.com/a/page.html"]
    ) == 0
    out = capsys.readouterr().out
    assert "host :\th.example.com" in out
    assert "type :\ttext/html" in out
    assert "digest :" in out and "quality :" in out


def test_install_preserves_old_until_new_lands(tmp_path):
    """_install renames the previous table aside before the new one
    moves in (CrawlDb.install): no window where the live dir is gone."""
    import os

    from nutch import _install

    target = tmp_path / "db"
    os.makedirs(target); (target / "a.parquet").write_text("old")
    tmp = tmp_path / "db.tmp"
    os.makedirs(tmp); (tmp / "b.parquet").write_text("new")
    _install(str(tmp), str(target))
    assert (target / "b.parquet").read_text() == "new"
    assert not os.path.exists(tmp_path / "db.old")
    assert not os.path.exists(tmp)
    # fresh-install path (no previous table)
    tmp2 = tmp_path / "db2.tmp"
    os.makedirs(tmp2); (tmp2 / "c.parquet").write_text("new2")
    _install(str(tmp2), str(tmp_path / "db2"))
    assert (tmp_path / "db2" / "c.parquet").read_text() == "new2"


def test_readlinkdb_dump_and_url(spark, tmp_path, capsys):
    outlinks = spark.createDataFrame(
        [
            ("http://a.example.com/", "http://t.example.com/1", "one"),
            ("http://b.example.com/", "http://t.example.com/1", "uno"),
            ("http://a.example.com/", "http://t.example.com/2", "two"),
        ],
        "url string, to_url string, anchor string",
    )
    ol = str(tmp_path / "outlinks")
    outlinks.write.parquet(ol)
    ldb = str(tmp_path / "linkdb")
    assert nutch_cli.main(["invertlinks", ldb, ol]) == 0
    capsys.readouterr()

    assert nutch_cli.main(["readlinkdb", ldb, "-url", "http://t.example.com/1"]) == 0
    out = capsys.readouterr().out
    assert "fromUrl: http://a.example.com/ anchor: one" in out
    assert "fromUrl: http://b.example.com/ anchor: uno" in out

    dump = str(tmp_path / "ldump")
    assert nutch_cli.main(["readlinkdb", ldb, "-dump", dump, "-regex", "/1$"]) == 0
    assert "dumped 1 targets" in capsys.readouterr().out

    assert nutch_cli.main(["readlinkdb", ldb, "-url", "http://nosuch.example.com/"]) == 0
    assert "no link information" in capsys.readouterr().out


def test_readseg_list_dump_get(spark, tmp_path, capsys):
    """SegmentReader parity (-list columns with '?' for missing parts;
    -dump writes url-sorted record groups; -get prints one URL)."""
    seg = str(tmp_path / "segment_0001")
    spark.createDataFrame(
        [
            ("http://a.example.com/", 33, 2_000, b"ab".hex()),
            ("http://b.example.com/", 33, 5_000, None),
        ],
        "url string, status int, fetch_time long, signature string",
    ).write.parquet(seg + "_crawl_fetch")
    spark.createDataFrame(
        [("http://a.example.com/", "hello text")], "url string, text string"
    ).write.parquet(seg + "_parse_text")
    spark.createDataFrame(
        [("http://a.example.com/", 67, 2_000)],
        "url string, status int, fetch_time long",
    ).write.parquet(seg + "_crawl_parse")

    assert nutch_cli.main(["readseg", "-list", seg]) == 0
    out = capsys.readouterr().out
    header, row = out.strip().splitlines()
    assert header.startswith("NAME\t\tGENERATED")
    # generated '?' (no crawl_generate), fetched 2, parsed 1, epoch times
    assert row.split("\t") == [
        "segment_0001", "?", "", "1970-01-01T00:00:02", "1970-01-01T00:00:05", "2", "1",
    ]

    assert nutch_cli.main(["readseg", seg, "-get", "http://a.example.com/"]) == 0
    out = capsys.readouterr().out
    assert "URL:: http://a.example.com/" in out
    assert "parse_text ParseText::\nhello text" in out
    assert '"status":33' in out and '"status":67' in out

    dump = str(tmp_path / "segdump")
    assert nutch_cli.main(["readseg", seg, "-dump", dump]) == 0
    assert "dumped 2 records" in capsys.readouterr().out
    text = spark.read.text(dump)
    urls = [r["value"][6:] for r in text.collect() if r["value"].startswith("URL:: ")]
    assert urls == sorted(urls) and len(urls) == 2

    assert nutch_cli.main(["readseg", seg]) == 2
    assert "one of -list/-dump/-get" in capsys.readouterr().err
