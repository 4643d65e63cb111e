"""ALTO-style export with per-word geometry and confidences (S6).

The reference's ALTO export (``core/layout.py:400-597``) derives word
bounding boxes by force-aligning the transcription to the CTC logits
(char → frame positions) and mapping frames to pixels; word confidence
is the mean of aligned letter confidences. This module reproduces that
chain: ``kernels.force_align`` (Viterbi) → frame spans per word →
pixel boxes (frames × px-per-frame) → ALTO-shaped XML string per line,
assembled per document in an ``applyInPandas`` group.

Deterministic: injected timestamps, stable word order.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from pero_ocr_spark.functions import kernels
from pero_ocr_spark.operators.ctc import CHARSET, synth_line_logits

PX_PER_FRAME = 8
BLANK = len(CHARSET) - 1


def word_boxes(text: str) -> list[dict]:
    """Force-align a line transcription to its logits and emit one
    (content, hpos, width, confidence) box per word."""
    if not text.strip():
        return []
    dense = synth_line_logits(text)
    seq = [CHARSET.index(c) for c in text if c in CHARSET[:-1]]
    if not seq:
        return []
    alignment = kernels.force_align(dense, seq, BLANK)
    # frame index of each aligned char occurrence (first frame of run)
    char_frames: list[int] = []
    prev = None
    for f, s in enumerate(alignment):
        if s != BLANK and (prev != s or (char_frames and f > 0 and alignment[f - 1] == BLANK)):
            char_frames.append(f)
        prev = s
    confs = kernels.letter_confidences(dense, np.asarray(alignment), BLANK)
    # split the aligned chars back into words (charset has no space, so
    # words were concatenated in charset order)
    boxes = []
    ci = 0
    for word in text.split(" "):
        chars = [c for c in word if c in CHARSET[:-1]]
        if not chars:
            continue
        f0 = char_frames[ci]
        f1 = char_frames[ci + len(chars) - 1]
        wconf = float(np.exp(np.mean(confs[ci : ci + len(chars)])))
        boxes.append(
            {
                "content": word,
                "hpos": f0 * PX_PER_FRAME,
                "width": (f1 - f0 + 1) * PX_PER_FRAME,
                "confidence": round(wconf, 4),
            }
        )
        ci += len(chars)
    return boxes


def export_alto(extracted: DataFrame) -> DataFrame:
    """Ordered text spans → one ALTO-shaped XML string per document,
    with <String> word boxes from forced alignment."""

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["kind"] == "text"].sort_values("ord")
        doc_id = int(pdf["doc_id"].iloc[0])
        parts = [
            '<?xml version="1.0" encoding="utf-8"?>',
            '<alto xmlns="pero:alto:2026"><Layout><Page>',
        ]
        for r in pdf.itertuples(index=False):
            parts.append(f'<TextLine ID="l{r.ord}" VPOS="{int(r.ord) * 30}">')
            for b in word_boxes(r.text):
                parts.append(
                    f'<String CONTENT="{escape(b["content"])}" '
                    f'HPOS="{b["hpos"]}" WIDTH="{b["width"]}" '
                    f'WC="{b["confidence"]}"/>'
                )
            parts.append("</TextLine>")
        parts.append("</Page></Layout></alto>")
        return pd.DataFrame({"doc_id": [doc_id], "xml": ["".join(parts)]})

    return extracted.groupBy("doc_id").applyInPandas(
        per_doc, schema="doc_id long, xml string"
    )
