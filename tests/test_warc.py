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
        assert [(d, u, s, b) for _, d, u, s, _, _, b in back] == recs
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
        assert back[0][6] == evil
        assert back[1][6] == "<p>after</p>"

    def test_utf8_body_content_length_in_bytes(self):
        body = "über 北京 naïve"                   # multi-byte chars
        back = W.parse_warc_shard(
            W.build_warc_shard([(9, "https://u.example.com/doc/9", 200, body)])
        )
        assert back[0][6] == body

    def test_http_fields_parsed(self):
        back = W.parse_warc_shard(
            W.build_warc_shard([(3, "https://h.example.com/doc/3", 404, "")])
        )
        idx, doc_id, url, status, ctype, location, body = back[0]
        assert (doc_id, status, body) == (3, 404, "")
        assert location == ""
        assert ctype == "text/html; charset=utf-8"

    def test_bad_version_line_raises(self):
        with pytest.raises(ValueError):
            W.parse_warc_shard(b"HTTP/1.1 200 OK\r\n\r\n")

    def test_deterministic_bytes(self):
        recs = [(1, "https://a.example.com/doc/1", 200, "<p>a</p>")]
        assert W.build_warc_shard(recs) == W.build_warc_shard(recs)


class TestGzipMembers:
    RECS = [
        (1, "https://a.example.com/doc/1", 200, "<p>hello</p>"),
        (57, "https://b.example.com/doc/57", 404, ""),
        (99, "https://c.example.com/doc/99", 200, "<p>x</p>"),
    ]

    def test_gzip_parses_identically_to_plain(self):
        plain = W.parse_warc_shard(W.build_warc_shard(self.RECS))
        gz = W.parse_warc_shard(
            W.build_warc_shard(self.RECS, gzip_members=True)
        )
        assert gz == plain

    def test_one_member_per_record_seekable(self):
        # the .warc.gz property: each member decompresses to exactly
        # one record, so a reader can start at any member offset
        import zlib

        buf = W.build_warc_shard(self.RECS, gzip_members=True)
        pos, members = 0, []
        while pos < len(buf):
            d = zlib.decompressobj(wbits=31)
            raw = d.decompress(buf[pos:])
            members.append(raw)
            pos = len(buf) - len(d.unused_data)
        assert len(members) == len(self.RECS)
        for m, rec in zip(members, self.RECS):
            parsed = W.parse_warc_shard(m)
            assert len(parsed) == 1 and parsed[0][1] == rec[0]

    def test_gzip_deterministic_bytes(self):
        a = W.build_warc_shard(self.RECS, gzip_members=True)
        assert a == W.build_warc_shard(self.RECS, gzip_members=True)
        assert a[:2] == b"\x1f\x8b"

    def test_truncated_member_raises(self):
        buf = W.build_warc_shard(self.RECS, gzip_members=True)
        with pytest.raises(ValueError):
            W.parse_warc_shard(buf[: len(buf) - 8])

    def test_body_embedding_gzip_magic_survives(self):
        # a body that CONTAINS the gzip magic must not confuse the
        # member walk (members are found by decompressor handoff,
        # never by scanning for \x1f\x8b)
        evil = "x\x1f\x8by" + "\r\n\r\nWARC/1.0\r\n"
        recs = [(5, "https://e.example.com/doc/5", 200, evil)]
        back = W.parse_warc_shard(W.build_warc_shard(recs, gzip_members=True))
        assert back[0][6] == evil


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


class TestRedirects:
    def test_location_header_roundtrip(self):
        recs = [(3, "https://a.example.com/doc/3", 301, "",
                 "https://b.example.com/doc/10"),
                (10, "https://b.example.com/doc/10", 200, "<p>final</p>")]
        back = W.parse_warc_shard(W.build_warc_shard(recs))
        assert back[0][3] == 301
        assert back[0][5] == "https://b.example.com/doc/10"
        assert back[1][5] == ""            # no Location on a 200

    def test_resolve_chains_by_url(self, spark):
        docs = spark.createDataFrame(
            [(i, f"<p>doc {i}</p>", "web") for i in range(60)],
            "doc_id long, html string, source string",
        )
        caps = W.capture_table(docs, with_redirects=True, n_docs=60)
        recs = W.parse_warc_records(W.synthesize_warc_shards(caps, n_shards=4))
        out = W.resolve_redirects(recs, max_hops=4).toPandas().set_index("doc_id")
        # chain lengths by construction: 17 -> 24 (1 hop),
        # 10 -> 17 -> 24 (2), 3 -> 10 -> 17 -> 24 (3)
        assert out.loc[3, "hops"] == 3 and out.loc[3, "final_status"] == 200
        assert out.loc[10, "hops"] == 2
        assert out.loc[17, "hops"] == 1
        assert out.loc[3, "final_url"].endswith("/doc/24")
        assert bool(out.loc[3, "resolved"])
        # non-redirect rows untouched
        assert out.loc[24, "hops"] == 0
        assert out.loc[24, "final_url"] == out.loc[24, "start_url"]
        # the 404 branch is preserved through resolution
        assert out.loc[7, "final_status"] == 404

    def test_unresolvable_location_flagged(self, spark):
        # a Location pointing OUTSIDE the capture: follow once, miss,
        # stay 301, resolved=False, no infinite loop
        rows = [(1, "https://a.example.com/doc/1", 301, "",
                 "https://gone.example.com/404me"),
                (2, "https://a.example.com/doc/2", 200, "<p>x</p>", "")]
        df = spark.createDataFrame(
            rows,
            "doc_id long, url string, status long, body string, location string",
        )
        recs = W.parse_warc_records(W.synthesize_warc_shards(df, n_shards=1))
        out = W.resolve_redirects(recs, max_hops=4).toPandas().set_index("doc_id")
        assert not bool(out.loc[1, "resolved"])
        assert out.loc[1, "final_status"] == 301
        assert out.loc[1, "hops"] == 0
        assert bool(out.loc[2, "resolved"])


class TestRobots:
    def test_rule_branches_and_broadcast(self, spark):
        docs = spark.createDataFrame(
            [(i, "<p>x</p>", f"src{s}") for i, s in
             [(0, 0), (1, 0), (2, 2), (3, 2), (4, 1)]],
            "doc_id long, html string, source string",
        )
        caps = W.capture_table(docs).select("doc_id", "url")
        out = W.robots_filter(caps, W.synth_robots(docs)).toPandas(
        ).set_index("doc_id")
        # src0: disallow_all blocks both ids
        assert not out.loc[0, "allowed"] and not out.loc[1, "allowed"]
        # src2: disallow_odd blocks odd doc ids only
        assert out.loc[2, "allowed"] and not out.loc[3, "allowed"]
        # src1: allow
        assert out.loc[4, "allowed"] and out.loc[4, "rule"] == "allow"
        # host-sized rule table must broadcast
        plan = W.robots_filter(caps, W.synth_robots(docs))._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_unknown_host_defaults_to_allow(self, spark):
        caps = spark.createDataFrame(
            [(9, "https://nowhere.example.org/doc/9")], "doc_id long, url string"
        )
        robots = spark.createDataFrame(
            [("web.example.com", "disallow_all")], "host string, rule string"
        )
        out = W.robots_filter(caps, robots).collect()[0]
        assert out["allowed"] and out["rule"] == "allow"


class TestCdxIndex:
    RECS = [
        (1, "https://a.example.com/doc/1", 200, "<p>hello</p>"),
        (57, "https://b.example.com/doc/57", 404, ""),
        (99, "https://c.example.com/doc/99", 200, "<p>x</p>"),
    ]

    @pytest.mark.parametrize("gz", [False, True])
    def test_slices_parse_standalone(self, gz):
        buf = W.build_warc_shard(self.RECS, gzip_members=gz)
        idx = W.index_warc_shard(buf)
        assert [e[1] for e in idx] == [r[0] for r in self.RECS]
        for rec_index, doc_id, url, status, off, length in idx:
            one = W.parse_warc_shard(buf[off : off + length])
            assert len(one) == 1
            assert (one[0][1], one[0][2], one[0][3]) == (doc_id, url, status)

    @pytest.mark.parametrize("gz", [False, True])
    def test_offsets_tile_the_shard(self, gz):
        # entries are contiguous and cover every byte exactly once
        buf = W.build_warc_shard(self.RECS, gzip_members=gz)
        idx = W.index_warc_shard(buf)
        pos = 0
        for _, _, _, _, off, length in idx:
            assert off == pos
            pos += length
        assert pos == len(buf)

    def test_index_matches_parse_order(self):
        buf = W.build_warc_shard(self.RECS, gzip_members=True)
        parsed = W.parse_warc_shard(buf)
        idx = W.index_warc_shard(buf)
        assert [(e[0], e[1]) for e in idx] == [(r[0], r[1]) for r in parsed]
