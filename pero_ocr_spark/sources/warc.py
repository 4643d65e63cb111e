"""WARC container source — web-archive record framing for the ingest
tier.

The reference engine consumes a folder of page images
(``user_scripts/parse_folder.py:297-303``); the 100 TB analog of "the
folder" for a web-extraction pipeline is a WARC archive (ISO 28500 —
the Common Crawl container): length-framed response records, each a
WARC header block plus a captured HTTP message. This module
synthesizes deterministic WARC shards from the corpus tables and
parses them back, feeding the existing DOM-extraction pipeline
(operators/html.py), so the whole web path is container → record
framing → HTTP parse → boilerplate strip → interleaved spans.

Parsing is **length-framed, never delimiter-split**: records are
walked by ``Content-Length`` exactly as real WARC readers do, so a
body that happens to contain ``WARC/1.0`` or a header-terminator
sequence parses intact (tested). A naive ``split(b"WARC/1.0")``
corrupts such records — the kind of bug that appears once per billion
pages, i.e. several thousand times at corpus scale.

Scale shape: shard synthesis is a carry-free ``applyInPandas`` per
shard group (pinned repartition); parsing is a stateless
``mapInPandas`` over (shard_id, warc) rows — shards are independent,
so the stage scales with shard count and no record ever crosses a
task boundary (WARC's design property).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_DATE = "2026-01-01T00:00:00Z"   # deterministic capture timestamp
_REASON = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}


def build_warc_shard(records) -> bytes:
    """``[(doc_id, url, status, body_str), …]`` → one WARC shard.

    Each record: WARC/1.0 header block (Content-Length = byte length
    of the captured HTTP message), then the HTTP response, then the
    record separator CRLF CRLF.
    """
    out = bytearray()
    for doc_id, url, status, body in records:
        body_b = body.encode("utf-8")
        status = int(status)
        http = (
            f"HTTP/1.1 {status} {_REASON.get(status, 'OK')}\r\n"
            f"Content-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(body_b)}\r\n\r\n"
        ).encode("ascii") + body_b
        out += (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Record-ID: "
            f"<urn:uuid:00000000-0000-0000-0000-{int(doc_id):012d}>\r\n"
            f"WARC-Date: {WARC_DATE}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("ascii")
        out += http + b"\r\n\r\n"
    return bytes(out)


def parse_warc_shard(buf: bytes):
    """Length-framed record walk →
    ``[(rec_index, doc_id, url, status, content_type, body_str), …]``.
    """
    out, pos, idx = [], 0, 0
    n = len(buf)
    while pos < n:
        hdr_end = buf.index(b"\r\n\r\n", pos)
        lines = buf[pos:hdr_end].decode("utf-8").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line at offset {pos}")
        fields = dict(ln.split(": ", 1) for ln in lines[1:])
        clen = int(fields["Content-Length"])
        block = buf[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen + 4          # skip the record separator

        rid = fields["WARC-Record-ID"]
        doc_id = int(rid[rid.rindex("-") + 1 : -1])
        http_end = block.index(b"\r\n\r\n")
        http_lines = block[:http_end].decode("utf-8").split("\r\n")
        status = int(http_lines[0].split(" ")[1])
        hfields = dict(ln.split(": ", 1) for ln in http_lines[1:])
        body = block[http_end + 4 :].decode("utf-8")
        out.append(
            (idx, doc_id, fields["WARC-Target-URI"], status,
             hfields.get("Content-Type", ""), body)
        )
        idx += 1
    return out


# ------------------------------------------------------------- Spark stages

_SHARD_SCHEMA = StructType([
    StructField("shard_id", LongType()),
    StructField("warc", BinaryType()),
    StructField("n_records", LongType()),
    StructField("n_bytes", LongType()),
])

_REC_SCHEMA = StructType([
    StructField("shard_id", LongType()),
    StructField("rec_index", LongType()),
    StructField("doc_id", LongType()),
    StructField("url", StringType()),
    StructField("status", LongType()),
    StructField("content_type", StringType()),
    StructField("body", StringType()),
])


def capture_table(pages: DataFrame) -> DataFrame:
    """(doc_id, html) + documents.source → the deterministic capture:
    ``url = https://{source}.example.com/doc/{doc_id}``; every 50th
    doc (doc_id % 50 == 7) was a 404 with an empty body."""
    is404 = F.col("doc_id") % 50 == 7
    return pages.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"),
            F.lit(".example.com/doc/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.when(is404, F.lit(404)).otherwise(F.lit(200)).cast("long").alias("status"),
        F.when(is404, F.lit("")).otherwise(F.col("html")).alias("body"),
    )


def synthesize_warc_shards(captures: DataFrame, n_shards: int = 32) -> DataFrame:
    """(doc_id, url, status, body) → one WARC blob per shard
    (``shard = doc_id % n_shards``), records ordered by doc_id."""
    n = int(captures.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))

    def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        blob = build_warc_shard(
            list(zip(pdf["doc_id"], pdf["url"], pdf["status"], pdf["body"]))
        )
        return pd.DataFrame({
            "shard_id": [int(pdf["shard_id"].iloc[0])],
            "warc": [blob],
            "n_records": [len(pdf)],
            "n_bytes": [len(blob)],
        })

    return (
        captures.withColumn("shard_id", (F.col("doc_id") % n_shards).cast("long"))
        .repartition(n, "shard_id")
        .groupBy("shard_id")
        .applyInPandas(per_shard, schema=_SHARD_SCHEMA)
    )


def parse_warc_records(shards: DataFrame) -> DataFrame:
    """(shard_id, warc) → one row per archived HTTP response."""

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in
                    ("shard_id", "rec_index", "doc_id", "url", "status",
                     "content_type", "body")}
            for sid, blob in zip(pdf["shard_id"], pdf["warc"]):
                for idx, doc_id, url, status, ctype, body in parse_warc_shard(
                    bytes(blob)
                ):
                    rows["shard_id"].append(int(sid))
                    rows["rec_index"].append(idx)
                    rows["doc_id"].append(doc_id)
                    rows["url"].append(url)
                    rows["status"].append(status)
                    rows["content_type"].append(ctype)
                    rows["body"].append(body)
            yield pd.DataFrame(rows)

    return shards.select("shard_id", "warc").mapInPandas(gen, schema=_REC_SCHEMA)
