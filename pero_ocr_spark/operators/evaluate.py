"""Pipeline-evaluation operators: AUC, calibration, agreement, recall.

A curation pipeline is a stack of *classifiers* — quality gates,
language gates, dedup verdicts, ANN candidate generators. Shipping one
at 100 TB needs the measurement half: how well does the cheap model
rank documents (AUC), are its probabilities honest (calibration), do
two gates agree beyond chance (Cohen's kappa), and how much does the
approximate index lose vs exact search (recall@k)?

Reference analog: pero-ocr evaluates recognition with CER/WER and
per-page quality scores (``user_scripts/compare_page_xmls.py``,
``core/layout.py:778-847``); this module is the same idea applied to
the data-curation tier, built as exact distributed aggregations.

Scale notes (the shapes that survive 10^12 rows):

* ``binary_auc`` is the Mann-Whitney rank statistic, but a global rank
  over the corpus is the classic single-partition window trap. Scores
  are quantized to ``dp`` decimals FIRST (both engines round
  identically), so the cumulative walk runs over the *score domain* —
  at most 10^dp + 1 rows, corpus-independent — after one map-side-
  combinable count aggregation. Tie handling (average rank) falls out
  exactly: integer arithmetic until the final division.
* ``calibration_bins`` is one aggregation over ≤ n_bins keys; score
  sums ride DECIMAL so the distributed addition order cannot flip a
  final double ulp (the zipf_fit float-parity technique).
* ``rater_kappa`` consumes both verdict columns in the SAME row — zero
  joins, one global aggregate.
* ``recall_at_k`` joins two top-k frames on (query, neighbor): both
  sides are k·|queries| rows, broadcast-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binary_auc(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    dp: int = 6,
) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney U with average-rank ties) of a
    score against a boolean label, in two corpus-independent steps.

    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻). Grouping by the
    dp-quantized score gives per-value (n_pos, n_neg); with N⁻cum the
    negatives strictly below a value,

        AUC = Σ_s n_pos(s) · (2·N⁻cum(s) + n_neg(s)) / (2·P·N)

    — all integers until the one division. The only ordered walk is
    the cumulative sum over the distinct-score frame (≤ 10^dp + 1
    rows), an intentional single-partition window over a bounded
    domain, not over the corpus.
    """
    label = F.col(label_col).cast("boolean")
    per_score = scored.groupBy(
        F.round(F.col(score_col), dp).alias("s")
    ).agg(
        F.sum(label.cast("long")).alias("np"),
        F.sum((~label).cast("long")).alias("nn"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    # DECIMAL(38,0) term products: Σ t approaches P·N — at 10^12 rows
    # that overflows int64 long before it overflows the rank statistic
    terms = per_score.select(
        "np",
        "nn",
        (
            F.col("np").cast("decimal(38,0)")
            * (
                2 * F.coalesce(F.sum("nn").over(w), F.lit(0)) + F.col("nn")
            ).cast("decimal(38,0)")
        ).alias("t"),
    )
    return terms.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.round(
            F.sum("t").cast("double")
            / (2.0 * F.sum("np") * F.sum("nn")),
            6,
        ).alias("auc"),
    )


def calibration_bins(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram data: bucket predictions into ``n_bins``
    equal-width probability bins and compare mean predicted
    probability with the empirical positive rate per bin. A perfectly
    calibrated scorer has the two equal; the gap column is the
    per-bin expected-calibration-error contribution."""
    label = F.col(label_col).cast("boolean")
    score = F.col(score_col)
    binned = scored.select(
        F.least(
            F.floor(score * n_bins), F.lit(n_bins - 1)
        ).cast("long").alias("bin"),
        # DECIMAL sum: exact, order-independent across partitions
        score.cast("decimal(18,6)").alias("s"),
        label.cast("long").alias("y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("s").alias("sum_s"),
        F.sum("y").alias("n_pos"),
    )
    mean_pred = F.round(F.col("sum_s").cast("double") / F.col("n"), 6)
    frac_pos = F.round(F.col("n_pos") / F.col("n"), 6)
    return agg.select(
        "bin",
        "n",
        "n_pos",
        mean_pred.alias("mean_predicted"),
        frac_pos.alias("frac_positive"),
        F.round(mean_pred - frac_pos, 6).alias("gap"),
    )


def rater_kappa(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Cohen's kappa between two boolean verdict columns of the same
    frame — chance-corrected agreement between two document gates
    (e.g. a heuristic filter and a model filter). Zero joins: both
    verdicts live in the row; one global aggregate produces the 2×2
    table, kappa = (p_o − p_e) / (1 − p_e) with exact counts."""
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    counts = df.agg(
        F.count("*").alias("n"),
        F.sum((a & b).cast("long")).alias("n11"),
        F.sum((a & ~b).cast("long")).alias("n10"),
        F.sum((~a & b).cast("long")).alias("n01"),
        F.sum((~a & ~b).cast("long")).alias("n00"),
    )
    n = F.col("n")
    po = (F.col("n11") + F.col("n00")) / n
    pa1 = (F.col("n11") + F.col("n10")) / n
    pb1 = (F.col("n11") + F.col("n01")) / n
    pe = pa1 * pb1 + (1 - pa1) * (1 - pb1)
    kappa = F.when(pe < 1.0, (po - pe) / (1.0 - pe)).otherwise(F.lit(1.0))
    return counts.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.round(kappa, 6).alias("kappa"),
    )


def recall_at_k(
    approx: DataFrame, exact: DataFrame, k: int
) -> DataFrame:
    """Per-query recall@k of an approximate top-k result against the
    exact one. Both frames carry (query_id, neighbor_id); the join is
    k·|queries| vs k·|queries| — evaluation-sized, not corpus-sized.
    Left side is the EXACT set so queries the index lost entirely
    still report recall 0."""
    a = approx.select(
        F.col("query_id").alias("__qa"), F.col("neighbor_id").alias("__na")
    )
    hit = (
        exact.select("query_id", "neighbor_id")
        .join(
            a,
            (F.col("query_id") == F.col("__qa"))
            & (F.col("neighbor_id") == F.col("__na")),
            "left",
        )
        .select("query_id", F.col("__na").isNotNull().alias("hit"))
    )
    return hit.groupBy("query_id").agg(
        F.sum(F.col("hit").cast("long")).alias("n_hits"),
        F.round(F.sum(F.col("hit").cast("long")) / F.lit(float(k)), 6).alias(
            "recall"
        ),
    )


def select_embed_id(
    lines: DataFrame,
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Writer-adaptation embedding selection (ref
    user_scripts/select_embed_id.py:44-130): the reference's
    multi-writer OCR net exposes one style embedding per writer; the
    script k-means-clusters the embedding table, keeps one
    representative id per cluster, re-recognizes a transcribed sample
    with each representative, and adopts the id with minimal CER.

    Re-expressed Spark-first:

      * representatives: the shared deterministic Lloyd k-means
        (``similarity.kmeans_assign`` — broadcast codebook, min_by
        argmin) + min-id-per-cluster (the deterministic stand-in for
        the reference's random cluster member; same cluster-coverage
        semantics, reproducible);
      * variant recognition: the net is absent from this container,
        so each embedding id perturbs the decode through a
        deterministic per-(id, doc, position) character-drop channel
        with a per-id error period — the synth-logits analog of "a
        worse-matched writer embedding misreads more characters".
        ``decode(synth(s)) == s`` is pinned by the CTC tests, so the
        channel composes with the real decode identity and the CER
        arithmetic downstream is exactly the reference's;
      * scoring: one broadcast of the ≤k representative ids onto the
        sample, corruption + ``F.levenshtein`` fully in codegen (no
        Python), ONE map-side-combinable aggregate per id. Every id
        scores the SAME sample, so the denominator is constant and
        the argmin ranks by integer error counts — no float compare
        decides the winner.

    Output: (embed_id, char_errors, char_total, cer, selected) — one
    row per representative, `selected` marking the adopted id
    (min errors, ties to the lowest id, exactly argmin CER).
    """
    from pero_ocr_spark.operators import similarity

    reps = (
        similarity.kmeans_assign(embeddings, k=k, iters=iters)
        .groupBy("cell")
        .agg(F.min("vec_id").alias("embed_id"))
        .select("embed_id")
    )
    pair = lines.select("doc_id", "text").crossJoin(F.broadcast(reps))
    e = F.col("embed_id")
    period = F.lit(5) + ((e * 40503 + 7) % 2147483647) % 11
    chars = F.split(F.col("text"), "")

    def kept(ch, i):
        # i is 0-based; the SQL twin uses 1-based generate_series
        pos = i + 1
        return (
            (pos + e * 69069 + F.col("doc_id") * 31) % 2147483647
        ) % period != 0

    corrupted = F.array_join(F.filter(chars, kept), "")
    scored = pair.select(
        "embed_id",
        F.levenshtein("text", corrupted).alias("lev"),
        F.length("text").alias("n"),
    )
    agg = scored.groupBy("embed_id").agg(
        F.sum("lev").cast("long").alias("char_errors"),
        F.sum("n").cast("long").alias("char_total"),
    )
    w = Window.orderBy("char_errors", "embed_id")
    return agg.select(
        "embed_id",
        "char_errors",
        "char_total",
        F.round(F.col("char_errors") / F.col("char_total"), 6).alias("cer"),
        (F.row_number().over(w) == 1).alias("selected"),
    )
