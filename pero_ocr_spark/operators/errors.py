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


def corpus_bleu(
    docs: DataFrame,
    hyp_col: str = "hyp_toks",
    ref_col: str = "ref_toks",
    max_n: int = 4,
) -> DataFrame:
    """Per-document BLEU (Papineni et al., ACL 2002) between a
    hypothesis and a reference token sequence — the sequence-level
    companion to :func:`cer_summary`'s character-level CER and the
    word-level comparisons of ``compare_page_xml_texts.py:30-56``:
    where CER charges every edit, BLEU credits surviving n-gram
    structure, so reordering and dropped-word errors separate from
    substitution noise.

    Input: one row per document with two ``array<string>`` token
    columns. Output: doc_id, hyp_len, ref_len, clip1..clipN (exact
    clipped n-gram match counts, BIGINT) and ``bleu`` — geometric mean
    of the n-gram precisions with the brevity penalty, 6-dp rounded.

    Shuffle shape: one explode per side emits (doc, n, gram) rows —
    at most ``2 * max_n * tokens`` per document, counted with
    map-side partial aggregation; the clip sum min(hyp_count,
    ref_count) is a second doc-keyed aggregate; the only join is
    doc-level frame ↔ doc-level frame on doc_id. Nothing is
    broadcast, nothing is quadratic in document length, and no key is
    hotter than the longest single document — the same bound the
    extraction pipeline already lives with.

    Exactness discipline: every count is integer-exact; the total
    n-gram count per level is ``max(hyp_len - n + 1, 0)`` (derived,
    not summed, so no float enters until the final expression); the
    four log terms are rounded to 9 dp before a fixed-order sum
    (((t1+t2)+t3)+t4), the brevity-penalty exponent min(0, 1 - r/h)
    is a single IEEE division, and only the final exp is rounded to
    6 dp — the identical op sequence a serial oracle performs.
    """
    ks = list(range(1, max_n + 1))

    def grams(col, n):
        return F.when(
            F.size(col) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(col) - n),
                lambda i: F.concat_ws(" ", F.slice(col, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    sides = None
    for side, col in (("h", hyp_col), ("r", ref_col)):
        arr = F.array(
            *[
                F.struct(F.lit(n).alias("n"), grams(F.col(col), n).alias("g"))
                for n in ks
            ]
        )
        part = docs.select(
            "doc_id", F.lit(side).alias("side"), F.explode(arr).alias("ng")
        ).select(
            "doc_id", "side", F.col("ng.n").alias("n"), F.explode("ng.g").alias("gram")
        )
        sides = part if sides is None else sides.unionByName(part)

    gcounts = sides.groupBy("doc_id", "n", "gram").agg(
        F.sum(F.when(F.col("side") == "h", 1).otherwise(0)).alias("hc"),
        F.sum(F.when(F.col("side") == "r", 1).otherwise(0)).alias("rc"),
    )
    clips = (
        gcounts.filter(F.col("hc") > 0)
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("n") == k, F.least("hc", "rc")).otherwise(0))
                .cast("long")
                .alias(f"clip{k}")
                for k in ks
            ]
        )
    )
    lengths = docs.select(
        "doc_id",
        F.size(hyp_col).cast("long").alias("hyp_len"),
        F.size(ref_col).cast("long").alias("ref_len"),
    )
    # docs whose hypothesis is empty emit no gram rows — left join,
    # clips coalesce to 0 and the bleu guard sends them to 0.0
    joined = lengths.join(clips, "doc_id", "left").select(
        "doc_id",
        "hyp_len",
        "ref_len",
        *[
            F.coalesce(F.col(f"clip{k}"), F.lit(0)).cast("long").alias(f"clip{k}")
            for k in ks
        ],
    )

    hl = F.col("hyp_len").cast("double")
    logsum = None
    for k in ks:
        term = F.round(F.log(F.col(f"clip{k}").cast("double") / (hl - (k - 1))), 9)
        logsum = term if logsum is None else logsum + term
    guard = F.col("hyp_len") >= max_n
    for k in ks:
        guard = guard & (F.col(f"clip{k}") > 0)
    bleu = F.when(
        guard,
        F.round(
            F.exp(
                F.least(F.lit(0.0), F.lit(1.0) - F.col("ref_len").cast("double") / hl)
                + F.lit(1.0 / max_n) * logsum
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return joined.withColumn("bleu", bleu)


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


def corpus_chrf(
    docs: DataFrame,
    hyp_col: str = "hyp_str",
    ref_col: str = "ref_str",
    max_n: int = 6,
    beta: float = 2.0,
) -> DataFrame:
    """Per-document chrF (Popović, WMT 2015) between hypothesis and
    reference CHARACTER sequences — the tokenization-free companion to
    :func:`corpus_bleu`: where BLEU credits surviving word n-grams
    (and so charges a one-character OCR slip as a lost word), chrF
    scores character n-gram overlap, the standard metric for
    morphology-rich text and exactly the right grain for OCR output.

        chrP = (1/N) Σ_n  clip_n / hyp_grams_n
        chrR = (1/N) Σ_n  clip_n / ref_grams_n
        chrF = (1+β²)·chrP·chrR / (β²·chrP + chrR)      (β = 2)

    with clip_n = Σ_g min(hyp_count_g, ref_count_g) over char n-grams
    g of order n = 1..max_n; an order with no grams on a side
    contributes a 0 term (not skipped), so N is constant and the
    arithmetic is closed-form from the counts.

    Shuffle shape (identical to :func:`corpus_bleu`): one in-row gram
    explode per side → ≤ 2·max_n·chars rows per doc, reduced by a
    map-side-combinable (doc, n, gram) count agg; clips are a second
    doc-keyed agg; the single join is doc-frame ↔ doc-frame. No
    broadcast, nothing quadratic, hottest key = longest document.

    Exactness: counts integer-exact; gram totals DERIVED from string
    length (max(len − n + 1, 0)); each precision/recall term is one
    IEEE division rounded to 9 dp, summed in fixed order; the final
    F-ratio is one identically-parenthesized expression rounded to
    6 dp — a serial oracle reproduces it bit-for-bit.
    """
    ks = list(range(1, max_n + 1))

    # substring with a COLUMN start index: SQL expr is the clean route
    # (pyspark's F.substring takes literal ints only)
    def grams_expr(colname, n):
        return (
            f"CASE WHEN length({colname}) >= {n} THEN "
            f"transform(sequence(1, length({colname}) - {n - 1}), "
            f"i -> substring({colname}, i, {n})) "
            f"ELSE array() END"
        )

    sides = None
    for side, col in (("h", hyp_col), ("r", ref_col)):
        arr = F.array(
            *[
                F.struct(
                    F.lit(n).alias("n"),
                    F.expr(grams_expr(col, n)).alias("g"),
                )
                for n in ks
            ]
        )
        part = docs.select(
            "doc_id", F.lit(side).alias("side"), F.explode(arr).alias("ng")
        ).select(
            "doc_id",
            "side",
            F.col("ng.n").alias("n"),
            F.explode("ng.g").alias("gram"),
        )
        sides = part if sides is None else sides.unionByName(part)

    gcounts = sides.groupBy("doc_id", "n", "gram").agg(
        F.sum(F.when(F.col("side") == "h", 1).otherwise(0)).alias("hc"),
        F.sum(F.when(F.col("side") == "r", 1).otherwise(0)).alias("rc"),
    )
    clips = (
        gcounts.filter((F.col("hc") > 0) & (F.col("rc") > 0))
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("n") == k, F.least("hc", "rc")).otherwise(0))
                .cast("long")
                .alias(f"clip{k}")
                for k in ks
            ]
        )
    )
    lengths = docs.select(
        "doc_id",
        F.length(hyp_col).cast("long").alias("hyp_len"),
        F.length(ref_col).cast("long").alias("ref_len"),
    )
    joined = lengths.join(clips, "doc_id", "left").select(
        "doc_id",
        "hyp_len",
        "ref_len",
        *[
            F.coalesce(F.col(f"clip{k}"), F.lit(0)).cast("long").alias(f"clip{k}")
            for k in ks
        ],
    )

    def avg_terms(len_col):
        s = None
        for k in ks:
            tot = F.greatest(F.col(len_col) - (k - 1), F.lit(0)).cast("double")
            term = F.when(
                tot > 0,
                F.round(F.col(f"clip{k}").cast("double") / tot, 9),
            ).otherwise(F.lit(0.0))
            s = term if s is None else s + term
        return s / F.lit(float(max_n))

    p = avg_terms("hyp_len")
    r = avg_terms("ref_len")
    b2 = beta * beta
    chrf = F.when(
        (F.lit(b2) * p + r) > 0,
        F.round(
            (F.lit(1.0 + b2) * p * r) / (F.lit(b2) * p + r), 6
        ),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "doc_id",
        "hyp_len",
        "ref_len",
        F.round(p, 6).alias("chrp"),
        F.round(r, 6).alias("chrr"),
        chrf.alias("chrf"),
    )
