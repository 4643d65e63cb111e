"""Chunked decoding (R4): chunk/merge kernel fixtures and the Spark stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from pero_ocr_spark.functions import kernels
from pero_ocr_spark.operators import ctc


class TestChunkSequence:
    def test_short_single_chunk(self):
        assert kernels.chunk_sequence(10, 16) == [(0, 10)]

    def test_windows_cover_everything(self):
        spans = kernels.chunk_sequence(50, 16, overlap=4)
        assert spans[0][0] == 0
        assert spans[-1][1] == 50
        for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
            assert a2 < b1  # overlapping
            assert a2 == a1 + 12  # stride = max - overlap

    def test_exact_multiple(self):
        spans = kernels.chunk_sequence(16, 16)
        assert spans == [(0, 16)]


class TestMerge:
    def test_single_part(self):
        assert kernels.merge_chunk_transcriptions(["hello"]) == "hello"

    def test_exact_overlap_reconstructs(self):
        # 'abcdefghij' chunked at 6 with overlap 2: 'abcdef', 'efghij'
        assert (
            kernels.merge_chunk_transcriptions(["abcdef", "efghij"]) == "abcdefghij"
        )

    def test_noisy_overlap(self):
        # one wrong char in the junction still merges
        out = kernels.merge_chunk_transcriptions(["abcdeX", "efghij"])
        assert out.startswith("abcde") or out.startswith("abcd")
        assert out.endswith("ghij")

    def test_best_overlap_exact(self):
        assert kernels.best_overlap("abcdef", "efghij") == 2


def test_spark_chunked_decode_reconstructs(spark):
    rows = [
        (1, "l0", "thequickbrownfox2jumps9over"),
        (1, "l1", "short"),
        (2, "l0", "distinctcharsmakechunkingsafe01"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, line_id string, text string")
    out = {
        (r["doc_id"], r["line_id"]): r
        for r in ctc.decode_chunked(df, max_chars=12, overlap=4).collect()
    }
    assert out[(1, "l1")]["transcription"] == "short"
    assert out[(1, "l1")]["n_chunks"] == 1
    assert out[(1, "l0")]["transcription"] == "thequickbrownfox2jumps9over"
    assert out[(1, "l0")]["n_chunks"] > 1
    assert out[(2, "l0")]["transcription"] == "distinctcharsmakechunkingsafe01"
