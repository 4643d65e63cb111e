"""Error aggregation operators (A1/A2/A3, J5).

The two-phase aggregation pattern of the reference's ErrorsSummary
(``user_scripts/error_summary.py:101-163``): per-line edit stats
computed in an Arrow-batched kernel (Levenshtein DP with operation
counts, ``sequence_alignment.py`` semantics), then plain Catalyst
groupBy sums — partial aggregation is map-side, the shuffle carries
only counters. The confusion matrix is the relational form:
``groupBy(ref_char, hyp_char).count()`` over exploded alignment pairs.

Page quality (A3, ``core/layout.py:778-847``) is the power mean of
line confidences — a pure expression: pow(avg(pow(c, p)), 1/p).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pero_ocr_spark.functions import kernels


def line_edit_stats(pairs: DataFrame) -> DataFrame:
    """Per-line (ref, hyp) → edit stats. Input needs columns
    doc_id, line_id, ref, hyp."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [kernels.edit_stats(r, h) for r, h in zip(pdf["ref"], pdf["hyp"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "line_id": pdf["line_id"],
                    "dist": [s[0] for s in stats],
                    "subs": [s[1] for s in stats],
                    "ins": [s[2] for s in stats],
                    "dels": [s[3] for s in stats],
                    "ref_len": pdf["ref"].str.len(),
                }
            )

    return pairs.mapInPandas(
        run,
        schema="doc_id long, line_id string, dist long, subs long, ins long, "
        "dels long, ref_len long",
    )


def cer_summary(stats: DataFrame, by: str = "doc_id") -> DataFrame:
    """Two-phase CER aggregation: per-group error sums + CER."""
    return stats.groupBy(by).agg(
        F.sum("dist").cast("long").alias("sum_dist"),
        F.sum("subs").cast("long").alias("sum_subs"),
        F.sum("ins").cast("long").alias("sum_ins"),
        F.sum("dels").cast("long").alias("sum_dels"),
        F.sum("ref_len").cast("long").alias("sum_ref_len"),
        F.round(F.sum("dist") / F.sum("ref_len").cast("double"), 6).alias("cer"),
    )


def confusion_matrix(pairs: DataFrame) -> DataFrame:
    """Character confusion counts over alignment paths (the Counter
    matrix of error_summary.py:117-129, as a relational aggregate).
    Gaps are encoded as '∅'."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, hyps = [], []
            for r, h in zip(pdf["ref"], pdf["hyp"]):
                for rc, hc in kernels.align_strings(r, h):
                    refs.append(rc if rc is not None else "∅")
                    hyps.append(hc if hc is not None else "∅")
            yield pd.DataFrame({"ref_char": refs, "hyp_char": hyps})

    exploded = pairs.mapInPandas(run, schema="ref_char string, hyp_char string")
    return exploded.groupBy("ref_char", "hyp_char").agg(
        F.count("*").cast("long").alias("n")
    )


def power_mean_quality(
    df: DataFrame, value_col: str, group_col: str, p: float = 2.0
) -> DataFrame:
    """A3: power mean — pow(avg(pow(x, p)), 1/p) per group."""
    return df.groupBy(group_col).agg(
        F.round(
            F.pow(F.avg(F.pow(F.col(value_col), F.lit(p))), F.lit(1.0 / p)), 6
        ).alias("power_mean"),
        F.count("*").cast("long").alias("n"),
    )


def hyp_ref_compare(hyp: DataFrame, ref: DataFrame) -> DataFrame:
    """J5: full-outer join of hypothesis and reference line sets by id,
    flagging lines missing on either side
    (compare_page_xml_texts.py:30-56 semantics)."""
    h = hyp.select("doc_id", "line_id", F.col("transcription").alias("hyp"))
    r = ref.select("doc_id", "line_id", F.col("transcription").alias("ref"))
    return h.join(r, ["doc_id", "line_id"], "full_outer").select(
        "doc_id",
        "line_id",
        F.col("hyp").isNotNull().alias("in_hyp"),
        F.col("ref").isNotNull().alias("in_ref"),
        F.when(
            F.col("hyp").isNotNull() & F.col("ref").isNotNull(),
            F.levenshtein("hyp", "ref"),
        ).alias("dist"),
    )
