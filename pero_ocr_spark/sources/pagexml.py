"""PAGE-XML-style import/export (S2/S5) and the transcription sink (S9).

The reference serializes its document tree to PcGts PAGE-XML
(``core/layout.py:323-398`` export, ``:250-321`` import). Our span
documents serialize to a minimal PcGts-shaped XML: one <TextRegion>
holding ordered <TextLine> elements (text spans) and <ImageRegion>
elements (media spans). Timestamps are INJECTED constants, not wall
clock — exports are byte-deterministic (the reference stamps
``datetime.now()`` at layout.py:337-339, which breaks reproducibility;
designed out per SURVEY §4).

Export/import are Arrow-batched string builders/parsers per document
group — the mapInPandas analog of the reference's per-page ElementTree
work. Scale: one row per doc in/out; no shuffle beyond the groupBy.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator
from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CREATED = "2026-01-01T00:00:00"  # injected, deterministic


def export_page_xml(extracted: DataFrame) -> DataFrame:
    """Ordered span sequences → one PAGE-XML string per document."""

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ord")
        doc_id = int(pdf["doc_id"].iloc[0])
        parts = [
            '<?xml version="1.0" encoding="utf-8"?>',
            '<PcGts xmlns="pero:spans:2026">',
            f"<Metadata><Created>{CREATED}</Created></Metadata>",
            f'<Page imageFilename="doc-{doc_id}">',
            '<TextRegion id="r0">',
        ]
        for r in pdf.itertuples(index=False):
            if r.kind == "text":
                parts.append(
                    f'<TextLine id="l{r.ord}" index="{r.ord}">'
                    f"<TextEquiv><Unicode>{escape(r.text)}</Unicode></TextEquiv>"
                    "</TextLine>"
                )
            else:
                parts.append(
                    f'<ImageRegion id="m{r.ord}" index="{r.ord}" '
                    f'ref="{escape(r.media_ref)}"/>'
                )
        parts.extend(["</TextRegion>", "</Page>", "</PcGts>"])
        return pd.DataFrame({"doc_id": [doc_id], "xml": ["".join(parts)]})

    from pero_ocr_spark.operators import grouped_map_in_pandas

    return grouped_map_in_pandas(
        extracted, "doc_id", per_doc, schema="doc_id long, xml string"
    )


def import_page_xml(xml_df: DataFrame) -> DataFrame:
    """PAGE-XML strings → ordered span rows (inverse of export)."""
    ns = "{pero:spans:2026}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, xml in zip(pdf["doc_id"], pdf["xml"]):
                root = ET.fromstring(xml)
                for el in root.iter():
                    if el.tag == f"{ns}TextLine":
                        uni = el.find(f"{ns}TextEquiv/{ns}Unicode")
                        rows.append(
                            {
                                "doc_id": int(doc_id),
                                "kind": "text",
                                "text": uni.text or "",
                                "media_ref": "",
                                "ord": int(el.get("index")),
                            }
                        )
                    elif el.tag == f"{ns}ImageRegion":
                        rows.append(
                            {
                                "doc_id": int(doc_id),
                                "kind": "media",
                                "text": "",
                                "media_ref": el.get("ref"),
                                "ord": int(el.get("index")),
                            }
                        )
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "text", "media_ref", "ord"]
            )

    return xml_df.mapInPandas(
        run,
        schema="doc_id long, kind string, text string, media_ref string, ord long",
    )


def write_transcriptions(extracted: DataFrame, path: str) -> None:
    """S9 transcription sink: '{doc_id}-l{ord} {text}' lines, one file
    (coalesce(1), matching the reference's single transcription file,
    ``transcription_io.py:1-10``)."""
    (
        extracted.filter(F.col("kind") == "text")
        .orderBy("doc_id", "ord")
        .select(
            F.concat_ws(
                " ",
                F.concat(
                    F.col("doc_id").cast("string"), F.lit("-l"), F.col("ord")
                ),
                F.col("text"),
            ).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_transcriptions(spark, path: str) -> DataFrame:
    """Inverse of the transcription sink."""
    lines = spark.read.text(path)
    sep = F.instr(F.col("value"), " ")
    return lines.select(
        F.expr("substring(value, 1, instr(value, ' ') - 1)").alias("line_key"),
        F.expr("substring(value, instr(value, ' ') + 1)").alias("text"),
    )
