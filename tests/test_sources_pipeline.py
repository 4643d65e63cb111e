"""PAGE-XML round-trip, transcription sink round-trip, pipeline config."""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pero_ocr_spark import corpus
from pero_ocr_spark.operators import extract
from pero_ocr_spark.plans import pipeline
from pero_ocr_spark.sources import pagexml


def _extracted(spark, sf_dir, n_docs=30):
    spans = extract.extract_spans(corpus.spans_table(spark, sf_dir))
    return spans.filter(F.col("doc_id") < n_docs)


def test_page_xml_round_trip(spark, sf_dir):
    src = _extracted(spark, sf_dir)
    xml = pagexml.export_page_xml(src)
    back = pagexml.import_page_xml(xml)
    a = src.toPandas().sort_values(["doc_id", "ord"]).reset_index(drop=True)
    b = back.toPandas().sort_values(["doc_id", "ord"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_page_xml_deterministic(spark, sf_dir):
    src = _extracted(spark, sf_dir, n_docs=5)
    x1 = {r["doc_id"]: r["xml"] for r in pagexml.export_page_xml(src).collect()}
    x2 = {r["doc_id"]: r["xml"] for r in pagexml.export_page_xml(src).collect()}
    assert x1 == x2
    assert all("<Created>2026-01-01T00:00:00</Created>" in x for x in x1.values())


def test_xml_escaping(spark):
    rows = [(1, "text", "a < b & c", "", 0), (1, "media", "", "img://1/5", 1)]
    df = spark.createDataFrame(rows, "doc_id long, kind string, text string, media_ref string, ord long")
    xml = pagexml.export_page_xml(df)
    back = pagexml.import_page_xml(xml).collect()
    by_ord = {r["ord"]: r for r in back}
    assert by_ord[0]["text"] == "a < b & c"
    assert by_ord[1]["media_ref"] == "img://1/5"


def test_transcription_sink_round_trip(spark, sf_dir):
    src = _extracted(spark, sf_dir, n_docs=10)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/transcripts"
        pagexml.write_transcriptions(src, path)
        back = pagexml.read_transcriptions(spark, path)
        n_text = src.filter(F.col("kind") == "text").count()
        assert back.count() == n_text
        row = back.filter(F.col("line_key") == "1-l0").collect()
        assert len(row) == 1


def test_pipeline_equals_direct_composition(spark, sf_dir):
    doc_spans = corpus.spans_table(spark, sf_dir)
    direct = extract.extract_spans(doc_spans).toPandas()
    piped = pipeline.default_extract_pipeline()(doc_spans).toPandas()
    key = ["doc_id", "ord"]
    pd.testing.assert_frame_equal(
        direct.sort_values(key).reset_index(drop=True),
        piped.sort_values(key).reset_index(drop=True),
    )


def test_pipeline_unknown_stage_raises():
    with pytest.raises(KeyError, match="unknown stage"):
        pipeline.Pipeline.from_config({"stages": ["nope"]})


def test_pipeline_custom_stage(spark, sf_dir):
    pipeline.register_stage("only_media", lambda df: df.filter(F.col("kind") == "media"))
    p = pipeline.Pipeline.from_config(
        {"stages": ["explode", "classify", "strip", "order", "project", "only_media"]}
    )
    out = p(corpus.spans_table(spark, sf_dir))
    kinds = out.select("kind").distinct().collect()
    assert [r["kind"] for r in kinds] == ["media"]


def test_pipeline_ingest_chain_equals_direct(spark, sf_dir):
    from pero_ocr_spark.operators import html as H
    from pero_ocr_spark.plans import pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    p = pipeline.Pipeline.from_config(
        {"stages": ["html_synthesize", "html_spans"]}
    )
    got = sorted(map(tuple, p(docs).collect()))
    want = sorted(
        map(
            tuple,
            H.html_to_spans(H.synthesize_html_interleaved(docs)).collect(),
        )
    )
    assert got == want


DEFAULT_EXTRACT_INI = """
[STAGE_1]
METHOD = explode
[STAGE_2]
METHOD = classify
[STAGE_3]
METHOD = strip
[STAGE_4]
METHOD = order
[STAGE_5]
METHOD = project
"""


def test_pipeline_from_ini_equals_default_extract(spark, sf_dir):
    doc_spans = corpus.spans_table(spark, sf_dir)
    direct = pipeline.default_extract_pipeline()(doc_spans).toPandas()
    ini = pipeline.Pipeline.from_ini(DEFAULT_EXTRACT_INI)(doc_spans).toPandas()
    key = ["doc_id", "ord"]
    pd.testing.assert_frame_equal(
        direct.sort_values(key).reset_index(drop=True),
        ini.sort_values(key).reset_index(drop=True),
    )


def test_pipeline_from_ini_html_ingest_and_comma_list(spark, sf_dir, tmp_path):
    from pero_ocr_spark.operators import html as H

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    # comma-list spelling, loaded from an actual file on disk
    path = tmp_path / "ingest.ini"
    path.write_text("[PIPELINE]\nSTAGES = html_synthesize, html_spans\n")
    p = pipeline.Pipeline.from_ini(str(path))
    got = sorted(map(tuple, p(docs).collect()))
    want = sorted(
        map(
            tuple,
            H.html_to_spans(H.synthesize_html_interleaved(docs)).collect(),
        )
    )
    assert got == want


def test_pipeline_from_ini_errors():
    with pytest.raises(KeyError, match="unknown stage"):
        pipeline.Pipeline.from_ini("[STAGE_1]\nMETHOD = nope\n")
    with pytest.raises(KeyError, match="no METHOD"):
        pipeline.Pipeline.from_ini("[STAGE_1]\nOTHER = x\n")
    with pytest.raises(KeyError, match="defines no stages"):
        pipeline.Pipeline.from_ini("[IRRELEVANT]\nA = 1\n")
