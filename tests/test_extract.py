"""Span-sequence equality of the Spark extraction pipeline vs the
single-process oracle — the BASELINE.json input_hint invariant
(kind, text, media_ref, order) per document.
"""

from __future__ import annotations

import pandas as pd

from pero_ocr_spark import corpus, oracle
from pero_ocr_spark.operators import extract


def _spark_result(spark, sf_dir) -> pd.DataFrame:
    doc_spans = corpus.spans_table(spark, sf_dir)
    out = extract.extract_spans(doc_spans)
    return out.toPandas()


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["doc_id", "ord"]).reset_index(drop=True)


def test_span_sequence_equality(spark, sf_dir):
    got = _sorted(_spark_result(spark, sf_dir))
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    want = _sorted(oracle.extract_documents(docs))
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "ord": "int64"}),
        want.astype({"doc_id": "int64", "ord": "int64"}),
    )


def test_order_dense_per_doc(spark, sf_dir):
    got = _spark_result(spark, sf_dir)
    for _, g in got.groupby("doc_id"):
        ords = sorted(g["ord"].tolist())
        assert ords == list(range(len(ords)))


def test_scrambled_input_is_restored(spark, sf_dir):
    # the nested array really is scrambled (offsets not ascending)
    doc_spans = corpus.spans_table(spark, sf_dir)
    row = doc_spans.limit(1).collect()[0]
    offsets = [s["offset"] for s in row["spans"]]
    assert offsets != sorted(offsets)
    assert sorted(offsets) == list(range(len(offsets)))


def test_no_boilerplate_no_empty_text(spark, sf_dir):
    got = _spark_result(spark, sf_dir)
    assert set(got["kind"].unique()) <= {"text", "media"}
    txt = got[got["kind"] == "text"]
    assert (txt["text"] != "").all()
    assert not txt["text"].isin(extract.BOILERPLATE_WORDS).any()
    med = got[got["kind"] == "media"]
    assert med["media_ref"].str.startswith("img://").all()


def test_spans_table_hinted_matches_input_contract(spark, sf_dir):
    from pero_ocr_spark import corpus

    df = corpus.spans_table_hinted(spark, sf_dir)
    assert df.schema["doc_id"].dataType.simpleString() == "string"
    spans_t = df.schema["spans"].dataType.simpleString()
    assert spans_t == (
        "array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    ), spans_t
    assert df.count() > 0
