"""JSONL interchange ingest: explicit-schema parse, quarantine, explode."""

from __future__ import annotations

from pyspark.sql import functions as F

from pero_ocr_spark.sources import jsonl as J


def test_jsonl_roundtrip_and_quarantine(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(15)), f"s{i % 3}")
         for i in range(120)],
        "doc_id long, text string, source string",
    )
    lines = J.synthesize_jsonl(docs)
    valid, quarantine = J.parse_jsonl(lines)
    torn = {
        r["doc_id"] for r in docs.select("doc_id").collect()
        if ((r["doc_id"] * 69069 + 12345) % 2147483647) % 97 == 13
    }
    assert 0 < len(torn) < 120
    assert quarantine.count() == len(torn)
    # quarantine keeps the raw line for replay
    raws = [r["raw_line"] for r in quarantine.collect()]
    assert all(raw.startswith('{"id":') for raw in raws)
    # valid records parse exactly the non-torn ids
    got_ids = {r["id"] for r in valid.select(F.col("_rec.id").alias("id")).collect()}
    assert got_ids == {i for i in range(120)} - torn
    # spans explode in order with the right chunking (15 words -> 12+3)
    spans = J.jsonl_spans(lines).filter(F.col("doc_id") == 0).orderBy("ord").collect()
    assert [r["ord"] for r in spans] == [0, 1]
    assert spans[0]["span_text"].split() == [f"w{j}" for j in range(12)]
    assert spans[1]["span_text"].split() == [f"w{j}" for j in range(12, 15)]
    assert spans[0]["source"] == "s0"


def test_jsonl_rejects_wrong_shape_valid_json(spark):
    lines = spark.createDataFrame(
        [('{"unrelated": 5}',), ('[1, 2, 3]',), ('{"id": 7, "meta": {"source": "x"}, "spans": []}',)],
        "line string",
    )
    valid, quarantine = J.parse_jsonl(lines)
    assert valid.count() == 1
    assert quarantine.count() == 2


# ------------------------------------------------------- sitemap parse

def test_parse_sitemaps_tolerates_missing_optional_elements(spark):
    from pero_ocr_spark.sources import warc as W

    NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    xml = (
        f'<?xml version="1.0"?><urlset {NS}>'
        "<url><loc>https://h/a</loc><lastmod>2024-01-02</lastmod>"
        "<priority>0.9</priority></url>"
        "<url><loc>https://h/b</loc></url>"  # no lastmod/priority
        "</urlset>"
    )
    df = spark.createDataFrame([("h", xml)], "host string, xml string")
    rows = {r["url"]: r for r in W.parse_sitemaps(df).collect()}
    assert rows["https://h/a"]["lastmod"] == "2024-01-02"
    assert rows["https://h/a"]["priority"] == 0.9
    assert rows["https://h/b"]["lastmod"] is None
    assert rows["https://h/b"]["priority"] is None


def test_sitemap_roundtrip_and_verdicts(spark):
    from pero_ocr_spark.sources import warc as W

    docs = spark.createDataFrame(
        [(i, "t", f"s{i % 2}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    entries = W.parse_sitemaps(W.synth_sitemaps(docs))
    assert entries.count() == 30
    # ledger: everything fetched on day 15 except doc 3 (never seen)
    seen = spark.createDataFrame(
        [(f"https://s{i % 2}.example.com/doc/{i}", "2024-01-15")
         for i in range(30) if i != 3],
        "url string, fetched_at string",
    )
    v = {r["url"].rsplit("/", 1)[1]: r["status"]
         for r in W.sitemap_recrawl_verdicts(entries, seen).collect()}
    assert v["3"] == "new"
    # doc 20 -> lastmod day 21 > 15 -> changed; doc 10 -> day 11 -> fresh
    assert v["20"] == "changed"
    assert v["10"] == "fresh"


# ------------------------------------------------ robots.txt raw format

def _rules(spark, body):
    from pero_ocr_spark.sources import warc as W
    df = spark.createDataFrame([("h", body)], "host string, body string")
    return W.parse_robots_txt(df)


def test_robots_parser_groups_comments_and_patterns(spark):
    rules = _rules(
        spark,
        "# hello\nUser-agent: googlebot\nUser-agent: bingbot\n"
        "Disallow: /private/\nAllow: /private/ok$\n\n"
        "User-agent: *\nCrawl-delay: 5\nDisallow:\nDisallow: /tmp/*x\n",
    ).collect()
    got = {(r["agent"], r["is_allow"], r["pattern"], r["pattern_re"]) for r in rules}
    # consecutive user-agent lines share ONE group's rules
    assert ("googlebot", False, "/private/", "^/private/") in got
    assert ("bingbot", False, "/private/", "^/private/") in got
    assert ("googlebot", True, "/private/ok$", "^/private/ok$") in got
    # '*' group: crawl-delay skipped, empty Disallow emits nothing,
    # wildcard translated
    star = {t for t in got if t[0] == "*"}
    assert star == {("*", False, "/tmp/*x", "^/tmp/.*x")}


def test_robots_verdicts_longest_match_and_agent_preemption(spark):
    from pero_ocr_spark.sources import warc as W

    rules = _rules(
        spark,
        "User-agent: *\nDisallow: /doc/\nAllow: /doc/open/\n\n"
        "User-agent: special\nDisallow: /x/\n",
    )
    urls = spark.createDataFrame(
        [(1, "h", "/doc/42"), (2, "h", "/doc/open/42"),
         (3, "h", "/elsewhere"), (4, "h", "/x/1")],
        "doc_id long, host string, path string",
    )
    star = {r["doc_id"]: r["allowed"]
            for r in W.robots_verdicts(urls, rules).collect()}
    # longest match wins: /doc/open/ (allow) beats /doc/ (disallow)
    assert star == {1: False, 2: True, 3: True, 4: True}
    # a host WITH a group for the requested agent uses ONLY that group
    special = {r["doc_id"]: r["allowed"]
               for r in W.robots_verdicts(urls, rules, agent="special").collect()}
    assert special == {1: True, 2: True, 3: True, 4: False}


def test_robots_verdicts_no_rules_allows_everything(spark):
    from pero_ocr_spark.sources import warc as W

    rules = _rules(spark, "")
    urls = spark.createDataFrame(
        [(1, "h", "/a"), (2, "unknown-host", "/b")],
        "doc_id long, host string, path string",
    )
    out = W.robots_verdicts(urls, rules).collect()
    assert all(r["allowed"] for r in out) and len(out) == 2


def test_sitemap_shards_at_spec_cap(spark, monkeypatch):
    from pero_ocr_spark.sources import warc as W

    monkeypatch.setattr(W, "SITEMAP_MAX_URLS", 10)
    docs = spark.createDataFrame(
        [(i, "t", "s0") for i in range(25)],
        "doc_id long, text string, source string",
    )
    sm = W.synth_sitemaps(docs).collect()
    assert len(sm) == 3  # 25 urls / cap 10 -> 3 shard files, one host
    entries = W.parse_sitemaps(W.synth_sitemaps(docs))
    assert entries.count() == 25  # sharding loses nothing


def test_sitemap_torn_shard_leaves_quarantine_marker(spark):
    from pero_ocr_spark.sources import warc as W

    df = spark.createDataFrame(
        [("h", "<urlset><url><loc>https://h/a</loc></url></urlset"),  # torn
         ("h2", '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                "<url><loc>https://h2/b</loc>"
                "<priority>high</priority></url></urlset>")],
        "host string, xml string",
    )
    rows = W.parse_sitemaps(df).collect()
    marker = [r for r in rows if r["url"] is None]
    assert len(marker) == 1 and marker[0]["host"] == "h"
    ok = [r for r in rows if r["url"] == "https://h2/b"]
    assert len(ok) == 1 and ok[0]["priority"] is None  # junk priority nulls
    # verdicts drop the marker instead of inventing a 'new' null URL
    seen = spark.createDataFrame([("https://h2/b", "2024-01-01")],
                                 "url string, fetched_at string")
    v = W.sitemap_recrawl_verdicts(W.parse_sitemaps(df), seen).collect()
    assert all(r["url"] is not None for r in v) and len(v) == 1
