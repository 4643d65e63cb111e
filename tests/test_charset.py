"""Charset detection ladder (operators/charset.py): BOM > header >
meta > sniff precedence, the synthesis round trip, and the Spark
stage end-to-end."""

from __future__ import annotations

import codecs

from pero_ocr_spark.operators import charset as C


def test_bom_beats_header():
    body = codecs.BOM_UTF16_LE + "hi".encode("utf-16-le")
    codec, source, text = C._detect("iso-8859-1", body)
    assert (codec, source, text) == ("utf-16-le", "bom", "hi")


def test_utf8_bom():
    codec, source, text = C._detect("", codecs.BOM_UTF8 + "hé".encode("utf-8"))
    assert (codec, source, text) == ("utf-8", "bom", "hé")


def test_header_beats_meta():
    body = b'<meta charset="windows-1252">caf\xe9'
    codec, source, text = C._detect("iso-8859-1", body)
    assert (codec, source) == ("latin-1", "header")
    assert text.endswith("café")


def test_meta_only_scanned_in_prefix():
    # meta tag past the 1024-byte prescan window is ignored: the body
    # is valid utf-8, so the sniff rung decides
    body = b"x" * 1024 + b'<meta charset="windows-1252">rest'
    codec, source, _ = C._detect("", body)
    assert (codec, source) == ("utf-8", "sniff")


def test_sniff_fallback_latin1():
    codec, source, text = C._detect("", b"caf\xe9")
    assert (codec, source, text) == ("latin-1", "sniff", "café")


def test_round_trip_all_rungs(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} words") for i in range(20)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in C.decode_corpus(docs).collect()}
    assert len(rows) == 20
    for i in range(20):
        assert rows[i]["text"] == f"doc {i} words" + C.PROBE_SUFFIX
    # every rung fired
    assert {r["charset_source"] for r in rows.values()} == {
        "bom", "header", "meta", "sniff"
    }
    assert rows[9]["charset"] == "latin-1"  # invalid-utf-8 fallback
    assert rows[4]["charset"] == "utf-8"    # valid-utf-8 sniff
