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

from functools import lru_cache

import numpy as np
from pyspark.sql import DataFrame

from pero_ocr_spark.functions import kernels
from pero_ocr_spark.operators.ctc import CHARSET, synth_line_logits

PX_PER_FRAME = 8
BLANK = len(CHARSET) - 1


@lru_cache(maxsize=65536)
def word_boxes(text: str) -> list[dict]:
    """Force-align a line transcription to its logits and emit one
    (content, hpos, width, confidence) box per word.

    Memoized per executor process (``lru_cache`` below): corpus line
    texts follow a skewed word distribution, so across a long-lived
    python worker most calls are repeats — alignment runs once per
    DISTINCT transcription. Callers must treat the returned list as
    read-only."""
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
    """Ordered text spans → ALTO XML per document, via the ONE
    canonical exporter (``pcgts.export_alto_layout``) with default page
    geometry (single block, 30 px line pitch, 8 px/char line extents).
    Word <String> boxes + WC come from forced alignment inside the
    unified exporter, and the output round-trips through
    ``pcgts.import_alto`` / ``import_alto_words``."""
    from pyspark.sql import functions as F

    from pero_ocr_spark.sources import pcgts

    t = extracted.filter(F.col("kind") == "text")
    y = (F.col("ord") * 30 + 20).cast("double")
    x1 = F.greatest(F.length("text") * 8, F.lit(8)).cast("double")
    pt = lambda x, yy: F.array(x, yy)  # noqa: E731
    lines = t.select(
        "doc_id",
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("page_id"),
        F.lit(2000).cast("long").alias("page_h"),
        F.lit(1000).cast("long").alias("page_w"),
        F.lit("r0").alias("region_id"),
        F.lit("paragraph").alias("region_type"),
        F.lit(0).cast("long").alias("region_order"),
        F.concat(F.lit("l"), F.col("ord")).alias("line_id"),
        F.col("ord").alias("idx"),
        F.array(pt(F.lit(0.0), y), pt(x1, y)).alias("baseline"),
        F.array(
            pt(F.lit(0.0), y - 10),
            pt(x1, y - 10),
            pt(x1, y + 4),
            pt(F.lit(0.0), y + 4),
        ).alias("polygon"),
        F.lit(10.0).alias("height_up"),
        F.lit(4.0).alias("height_down"),
        F.col("text").alias("transcription"),
        F.lit(None).cast("double").alias("confidence"),
    )
    return pcgts.export_alto_layout(lines)
