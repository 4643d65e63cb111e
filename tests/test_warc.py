"""WARC container source (sources/warc.py): length-framed record
parsing, never delimiter splitting."""

import pandas as pd
import pytest

from pero_ocr_spark.sources import warc as W


class TestFraming:
    def test_roundtrip_multi_record(self):
        recs = [
            (1, "https://a.example.com/doc/1", 200, "<p>hello</p>"),
            (57, "https://b.example.com/doc/57", 404, ""),
            (99, "https://c.example.com/doc/99", 200, "<p>x</p>"),
        ]
        back = W.parse_warc_shard(W.build_warc_shard(recs))
        assert [(d, u, s, b) for _, d, u, s, _, b in back] == recs
        assert [i for i, *_ in back] == [0, 1, 2]

    def test_body_containing_warc_header_survives(self):
        # a captured page that EMBEDS a WARC record (an archive about
        # archives): delimiter splitting corrupts it, length framing
        # must not
        evil = "x\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nyyy\r\n\r\nz"
        recs = [(5, "https://e.example.com/doc/5", 200, evil),
                (6, "https://e.example.com/doc/6", 200, "<p>after</p>")]
        back = W.parse_warc_shard(W.build_warc_shard(recs))
        assert len(back) == 2
        assert back[0][5] == evil
        assert back[1][5] == "<p>after</p>"

    def test_utf8_body_content_length_in_bytes(self):
        body = "über 北京 naïve"                   # multi-byte chars
        back = W.parse_warc_shard(
            W.build_warc_shard([(9, "https://u.example.com/doc/9", 200, body)])
        )
        assert back[0][5] == body

    def test_http_fields_parsed(self):
        back = W.parse_warc_shard(
            W.build_warc_shard([(3, "https://h.example.com/doc/3", 404, "")])
        )
        idx, doc_id, url, status, ctype, body = back[0]
        assert (doc_id, status, body) == (3, 404, "")
        assert ctype == "text/html; charset=utf-8"

    def test_bad_version_line_raises(self):
        with pytest.raises(ValueError):
            W.parse_warc_shard(b"HTTP/1.1 200 OK\r\n\r\n")

    def test_deterministic_bytes(self):
        recs = [(1, "https://a.example.com/doc/1", 200, "<p>a</p>")]
        assert W.build_warc_shard(recs) == W.build_warc_shard(recs)


@pytest.mark.usefixtures("spark")
class TestSparkStages:
    def test_shard_roundtrip(self, spark):
        docs = spark.createDataFrame(
            [(i, f"<p>doc {i}</p>", "web") for i in range(40)],
            "doc_id long, html string, source string",
        )
        caps = W.capture_table(docs)
        shards = W.synthesize_warc_shards(caps, n_shards=4).toPandas()
        assert sorted(shards["shard_id"]) == [0, 1, 2, 3]
        assert shards["n_records"].sum() == 40

        recs = W.parse_warc_records(
            W.synthesize_warc_shards(caps, n_shards=4)
        ).toPandas().sort_values("doc_id").reset_index(drop=True)
        assert len(recs) == 40
        # 404 branch: doc 7 only (doc_id % 50 == 7)
        assert set(recs.loc[recs["status"] == 404, "doc_id"]) == {7}
        assert recs.loc[recs["doc_id"] == 7, "body"].iloc[0] == ""
        assert recs.loc[recs["doc_id"] == 8, "body"].iloc[0] == "<p>doc 8</p>"
        assert (
            recs.loc[recs["doc_id"] == 13, "url"].iloc[0]
            == "https://web.example.com/doc/13"
        )
        # per-shard record order is doc_id order
        for _, grp in recs.groupby("shard_id"):
            g = grp.sort_values("rec_index")
            assert list(g["doc_id"]) == sorted(g["doc_id"])
