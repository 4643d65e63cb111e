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
