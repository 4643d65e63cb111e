"""Corpus sampling and training-sequence packing.

The table-scale data-prep stages a training pipeline runs after
dedup/quality filtering: deterministic stratified sampling by source
(per-stratum keep quotas applied through a doc-id residue rule — no
RNG, rerun-stable, reproducible in ANSI SQL), and greedy token-budget
sequence packing (the corpus-level generalization of width-sorted
batch packing, ``ocr_engine/line_ocr_engine.py:79-91``: documents are
packed into fixed-token training sequences).

Scale shape: sampling is a pure filter — the predicate pushes into the
parquet scan and no shuffle happens at all. Packing windows partition
by a doc-derived bucket, so the cumulative sums run parallel per
bucket and never serialize into one global sort — the same distributed
design as ``lineage.repartition_weighted``, expressed as a reusable
table operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_stratified(docs: DataFrame, mod: int = 100) -> DataFrame:
    """Deterministic stratified sampling: each source stratum keeps a
    quota of ``10 + (stratum_index * 7) % 80`` docs per ``mod`` — a doc
    survives iff its id residue falls under its stratum's quota. The
    doc-id residue is uniform and independent of the stratum, so the
    realized rate converges to quota/mod per stratum."""
    quota = (
        F.lit(10)
        + (F.substring("source", 4, 10).cast("long") * 7) % 80
    ).cast("long")
    return (
        docs.select("doc_id", "source", quota.alias("keep_quota"))
        .filter(F.col("doc_id") % mod < F.col("keep_quota"))
    )


def pack_sequences(
    docs: DataFrame, budget: int = 512, n_buckets: int = 32
) -> DataFrame:
    """Greedy token-budget packing: within each doc bucket, documents
    (in deterministic doc_id order) are assigned to the training
    sequence their cumulative-token START offset falls into — every
    sequence holds ≤ budget + one document of tokens. seq_id is unique
    across buckets; seq_pos is the document's position inside its
    sequence."""
    nt = F.size(F.split(F.col("text"), " ")).cast("long")
    d = docs.select(
        "doc_id",
        nt.alias("n_tokens"),
        (F.col("doc_id") % n_buckets).cast("long").alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    d = d.withColumn(
        "pack",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget).cast(
            "long"
        ),
    )
    wp = Window.partitionBy("bucket", "pack").orderBy("doc_id")
    return d.select(
        "doc_id",
        "bucket",
        (F.col("bucket") * 1_000_000 + F.col("pack")).cast("long").alias(
            "seq_id"
        ),
        "n_tokens",
        (F.row_number().over(wp) - 1).cast("long").alias("seq_pos"),
    )
