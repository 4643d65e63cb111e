"""Snapshot-table (Iceberg-semantics) queries: commits, time travel, skipping.

Split out of the monolithic queries.py (round 5); the package
__init__ imports tier modules in dependency order, so registration
order is deterministic and the registry machinery lives in _base.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pero_ocr_spark import corpus
from pero_ocr_spark.operators import extract
from pero_ocr_spark.queries._base import (  # noqa: F401
    QueryFn, _EXTRACTED_CTE, _REGISTRY, _scratch, _t, register,
)
from pero_ocr_spark.queries._ctes import _HTML_PARA_CTE  # noqa: F401


@register(
    "iceberg_snapshot_reads",
    _EXTRACTED_CTE
    + """
, tags AS (
  SELECT 'current' AS tag, doc_id, ord, text FROM extracted
  UNION ALL
  SELECT 'time_travel_v1', doc_id, ord, text FROM extracted
  WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'incremental_v1_v2', doc_id, ord, text FROM extracted
  WHERE doc_id % 2 = 1
  UNION ALL
  SELECT 'pruned_range', doc_id, ord, text FROM extracted
  WHERE doc_id BETWEEN 100 AND 149
)
SELECT tag,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(ord) AS BIGINT) AS sum_ord,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
FROM tags
GROUP BY tag
""",
)
def q_iceberg_snapshot_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Snapshot-table lifecycle over the extraction output (the
    # north-rule Iceberg sink): commit the even-doc half as v1,
    # append the odd half as v2, then verify four read paths against
    # closed-form arithmetic — current, time travel to v1,
    # incremental v1->v2, and a stats-pruned range read (pruning is
    # an optimization, so the exact predicate is applied on top).
    from pero_ocr_spark.sources.icetable import IceTable

    spans = corpus.extracted_spans(spark, sf_dir)
    table = IceTable(_scratch("icetable"), stats_cols=("doc_id",))
    table.commit(
        spans.filter(F.col("doc_id") % 2 == 0).repartitionByRange(8, "doc_id")
    )
    table.commit(
        spans.filter(F.col("doc_id") % 2 == 1).repartitionByRange(8, "doc_id")
    )
    reads = [
        ("current", table.read(spark)),
        ("time_travel_v1", table.read(spark, version=1)),
        ("incremental_v1_v2", table.incremental(spark, 1, 2)),
        (
            "pruned_range",
            table.read(spark, prune={"doc_id": (100, 149)}).filter(
                F.col("doc_id").between(100, 149)
            ),
        ),
    ]
    parts = [
        df.select(F.lit(tag).alias("tag"), "doc_id", "ord", "text")
        for tag, df in reads
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return union.groupBy("tag").agg(
        F.count("*").alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("ord").alias("sum_ord"),
        F.sum(F.length("text")).alias("sum_text_len"),
    )


@register(
    "icetable_upsert_delete",
    """
WITH res AS (
  SELECT doc_id, text, source,
         (doc_id*69069 + 12345) % 2147483647 % 100 AS r
  FROM documents),
merged AS (
  SELECT doc_id,
         CASE WHEN r < 10 THEN 'rev2 ' || text ELSE text END AS text,
         source
  FROM res
  UNION ALL
  SELECT doc_id + 5000000, 'ins ' || source, source FROM res WHERE r = 55
)
SELECT doc_id, text, source FROM merged
WHERE NOT (doc_id % 2 = 1 AND doc_id < 100)
""",
)
def q_icetable_upsert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Row-level table ops on the snapshot format: commit the corpus
    # range-clustered, MERGE a revision batch (10% revised + new docs
    # far outside the key range), copy-on-write DELETE a narrow key
    # band, then read the final snapshot. The upsert's binary-search
    # key probe keeps non-overlapping files carried by reference (the
    # insert batch at +5M does not widen the rewrite set), and the
    # delete's stats prune bounds the rewrite to the low-key files —
    # both snapshots are O(files touched), verified row-exact against
    # the closed-form merge in DuckDB.
    from pero_ocr_spark.operators import sampling
    from pero_ocr_spark.sources.icetable import IceTable

    docs = _t(spark, sf_dir, "documents")
    table = IceTable(_scratch("icetable_rowops"), stats_cols=("doc_id",))
    base = docs.select("doc_id", "text", "source")
    table.commit(base.repartitionByRange(8, "doc_id"))
    r = sampling._residue(100)
    upd = docs.filter(r < 10).select(
        "doc_id", F.concat(F.lit("rev2 "), F.col("text")).alias("text"), "source"
    )
    ins = docs.filter(r == 55).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat(F.lit("ins "), F.col("source")).alias("text"),
        "source",
    )
    table.upsert(upd.unionByName(ins), key="doc_id")
    table.delete_where(
        spark, "doc_id % 2 = 1 AND doc_id < 100", prune={"doc_id": (0, 99)}
    )
    return table.read(spark)


@register(
    "icetable_bloom_skipping",
    """
SELECT doc_id, text, source FROM documents
WHERE doc_id IN (7, 93, 211, 348, 499)
""",
)
def q_icetable_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Point-lookup planning from per-file Bloom filters: the table is
    # committed hash-partitioned on source (deliberately NOT clustered
    # by doc_id, so min/max stats span the whole keyspace and range
    # pruning is useless), yet each point probe plans a strict subset
    # of files from manifest arithmetic alone — the bloom's clear bit
    # proves absence, driver-side, no job. No false negatives: every
    # looked-up row must surface, verified row-exact against the plain
    # SQL lookup. The Iceberg/Parquet bloom-metrics analog.
    from pero_ocr_spark.sources.icetable import IceTable

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    table = IceTable(
        _scratch("icetable_bloom"), stats_cols=(), bloom_cols=("doc_id",)
    )
    table.commit(docs.repartition(8, "source"))
    keys = [7, 93, 211, 348, 499]
    total = len(table.files())
    # Pruning is an optimization, never a correctness gate: at rows-
    # per-file well past BLOOM_FILE_M the filter saturates and a probe
    # keeps every file — that must degrade to a full scan, not an
    # error (round-4 advice). The achieved ratio is recorded on the
    # query function (`last_pruning`) for tests/bench to inspect.
    planned_files = 0
    parts = []
    for key in keys:
        planned = table.files(point={"doc_id": key})
        planned_files += len(planned)
        parts.append(
            table.read(spark, point={"doc_id": key}).filter(
                F.col("doc_id") == key
            )
        )
    q_icetable_bloom_skipping.last_pruning = {
        "files_total": total * len(keys),
        "files_planned": planned_files,
    }
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return union


@register(
    "icetable_wap_publish",
    """
WITH stages AS (
  SELECT 'head_during_audit' AS stage, doc_id FROM documents
  WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'after_publish', doc_id FROM documents
  UNION ALL
  SELECT 'after_failed_audit', doc_id FROM documents
)
SELECT stage,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM stages GROUP BY stage
""",
)
def q_icetable_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Write-audit-publish on the snapshot table: a staged commit is
    # invisible to readers (the version pointer never moves) until its
    # audit passes; a poison batch (null texts) fails the audit and is
    # abandoned — its version slot freed, its files deleted — so the
    # published table only ever holds audited data. This is the
    # production ingestion gate for a 10^12-doc table: quality checks
    # run against real committed files via time travel, and publish is
    # one atomic pointer swap.
    from pero_ocr_spark.sources.icetable import IceTable

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    table = IceTable(_scratch("icetable_wap"), stats_cols=("doc_id",))
    table.commit(docs.filter(F.col("doc_id") % 2 == 0))
    staged = table.commit(docs.filter(F.col("doc_id") % 2 == 1), audit=True)
    head_during_audit = table.read(spark)  # pointer still on v1
    assert (
        table.read(spark, version=staged).filter("text IS NULL").count() == 0
    ), "good batch must pass audit"
    table.publish(staged)
    after_publish = table.read(spark)
    poison = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.lit(None).cast("string").alias("text"),
    ).limit(10)
    bad = table.commit(poison, audit=True)
    assert (
        table.read(spark, version=bad).filter("text IS NULL").count() > 0
    ), "poison batch must fail audit"
    table.abandon(bad)
    after_failed = table.read(spark)
    parts = [
        ("head_during_audit", head_during_audit),
        ("after_publish", after_publish),
        ("after_failed_audit", after_failed),
    ]
    union = parts[0][1].select(F.lit(parts[0][0]).alias("stage"), "doc_id")
    for tag, df in parts[1:]:
        union = union.unionByName(df.select(F.lit(tag).alias("stage"), "doc_id"))
    return union.groupBy("stage").agg(
        F.count("*").alias("n_rows"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


@register(
    "icetable_mor_deletes",
    """
WITH survivors AS (
  SELECT doc_id, text FROM documents
  WHERE NOT (doc_id % 10 IN (3, 7))
    AND NOT (source = 'src1' AND doc_id % 10 = 4)),
stages AS (
  SELECT 'pre_delete' AS stage, doc_id, text FROM documents
  UNION ALL SELECT 'post_mor', doc_id, text FROM survivors
  UNION ALL SELECT 'post_compact', doc_id, text FROM survivors
)
SELECT stage,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
FROM stages GROUP BY stage
""",
)
def q_icetable_mor_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Merge-on-read DELETE on the snapshot table (Iceberg spec-v2
    # positional deletes): two sparse deletes publish position-delete
    # files only — pytest-asserted here that NO data file is rewritten
    # — reads anti-join the (broadcast-sized, known from manifest
    # arithmetic) delete set, and compaction folds the deletes into
    # clean files. This is the only delete shape that works at 100 TB:
    # copy-on-write rewrites every file containing one matching row;
    # MOR writes bytes proportional to the matches. Three read paths
    # verified row-exact: time travel to pre-delete, post-delete
    # (anti-join active), post-compaction (anti-join folded away).
    from pero_ocr_spark.sources.icetable import IceTable

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    table = IceTable(_scratch("icetable_mor"), stats_cols=("doc_id",))
    table.commit(docs.repartitionByRange(8, "doc_id"))
    files_v1 = set(table.files(1))
    table.delete_where_mor(spark, "doc_id % 10 IN (3, 7)")
    table.delete_where_mor(spark, "source = 'src1' AND doc_id % 10 = 4")
    assert set(table.files()) == files_v1, "MOR delete must not rewrite data"
    v_mor = table.current_version()
    assert table.delete_files(v_mor), "expected pending position deletes"
    v_compact = table.compact(spark, target_files=4)
    assert table.delete_files(v_compact) == [], "compaction must fold deletes"
    reads = [
        ("pre_delete", table.read(spark, version=1)),
        ("post_mor", table.read(spark, version=v_mor)),
        ("post_compact", table.read(spark, version=v_compact)),
    ]
    parts = [
        df.select(F.lit(tag).alias("stage"), "doc_id", "text")
        for tag, df in reads
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return union.groupBy("stage").agg(
        F.count("*").alias("n_rows"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum(F.length("text")).alias("sum_text_len"),
    )


@register(
    "corpus_zorder_skipping",
    None,  # interpolated below after zorder import
)
def q_corpus_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Z-order (Morton) clustering vs linear sort for two-dimensional
    # file skipping: events bucketized to (user % 256, hour % 256),
    # files simulated as fixed-width key ranges (the write-side
    # equivalent is repartitionByRange on the Morton key), per-file
    # min/max stats evaluated against a rectangular (user-block ×
    # time-window) predicate — exactly the pruning arithmetic
    # IceTable.files() applies from its manifest. The key is a pure
    # bitwise codegen expression, the report two map-side-combinable
    # aggs; identical integer arithmetic runs in DuckDB. The pytest
    # drives the REAL table path: an IceTable committed z-clustered
    # prunes both dims from stats alone.
    from pero_ocr_spark.operators import zorder

    ev = _t(spark, sf_dir, "events")
    return zorder.skipping_report(
        ev,
        x=F.col("user_id") % 256,
        y=F.floor(F.unix_timestamp("ts") / 3600).cast("long") % 256,
        box=(32, 47, 64, 95),
        bits=8,
        n_files=64,
    )


@register(
    "icetable_schema_evolution",
    """
SELECT doc_id, text,
       CASE WHEN doc_id % 2 = 1 THEN lang END AS lang
FROM documents
""",
)
def q_icetable_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # add-column schema evolution on the snapshot table: v1 commits
    # two columns, v2 appends three; the current read projects every
    # file through the LATEST snapshot schema so pre-evolution rows
    # surface the new column as null — no rewrite of old data files
    from pero_ocr_spark.sources.icetable import IceTable

    docs = _t(spark, sf_dir, "documents")
    table = IceTable(_scratch("icetable_evolve"), stats_cols=("doc_id",))
    table.commit(
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text")
        .repartitionByRange(4, "doc_id")
    )
    table.commit(
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text", "lang")
        .repartitionByRange(4, "doc_id")
    )
    return table.read(spark)


@register(
    "icetable_stream_ingest",
    f"""
WITH {_HTML_PARA_CTE},
kept AS (
  SELECT k.doc_id, -1 AS bk, 'text' AS kind,
         d.source || ' report' AS text, NULL AS media_ref
  FROM k JOIN documents d USING (doc_id) WHERE k.nw0 >= 8
  UNION ALL
  SELECT doc_id, pi*2, 'text', ptext, NULL
  FROM par WHERE nw >= 8 OR pi > 0
  UNION ALL
  SELECT doc_id, pi*2 + 1, 'media', NULL,
         'img://' || doc_id || '/' || pi
  FROM par WHERE pi % 2 = 1
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bk) - 1
            AS BIGINT) AS ord,
       kind, text, media_ref
FROM kept
""",
)
def q_icetable_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # streaming → snapshot-table TRANSACTIONAL sink, externally
    # verified: HTML pages ingest through availableNow micro-batches,
    # each one atomic tagged APPEND commit (replays skip via the
    # commit log, crash-mid-commit leaves no snapshot); the TABLE
    # read-back must equal the batch pipeline's closed form however
    # the engine slices the input into micro-batches.
    import os

    from pero_ocr_spark.operators import html as H
    from pero_ocr_spark.sources.icetable import IceTable
    from pero_ocr_spark.streaming import ingest

    root = _scratch("icetable_stream")
    pages_dir, table_root, ckpt = (
        os.path.join(root, d) for d in ("pages", "table", "ckpt")
    )
    docs = _t(spark, sf_dir, "documents")
    H.synthesize_html_interleaved(docs).coalesce(4).write.mode(
        "overwrite"
    ).parquet(pages_dir)
    q = ingest.stream_ingest_pages_icetable(spark, pages_dir, table_root, ckpt)
    q.awaitTermination(300)
    return (
        IceTable(table_root)
        .read(spark)
        .select("doc_id", "ord", "kind", "text", "media_ref")
    )


@register(
    "icetable_incremental_agg",
    """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source
""",
)
def q_icetable_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # incremental materialized-view maintenance over the snapshot
    # table's changelog (the Iceberg-CDC consumption pattern): the
    # per-source rollup is seeded from snapshot v1, the v1→v2 delta
    # comes from the changelog read — ONLY v2's files are scanned,
    # never the table — and partial aggregates merge by summation.
    # The merged view must equal the full recompute (the oracle);
    # at 10^12 docs the delta is the day's crawl, not the corpus.
    from pero_ocr_spark.sources.icetable import IceTable

    root = _scratch("ice_increment")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    table = IceTable(root)
    v1 = table.commit(docs.filter(F.col("doc_id") % 2 == 0), "append")
    base = table.read(spark, v1).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    v2 = table.commit(docs.filter(F.col("doc_id") % 2 == 1), "append")
    delta = table.incremental(spark, v1, v2).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    return (
        base.unionByName(delta)
        .groupBy("source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("total_chars").cast("long").alias("total_chars"),
        )
    )


_ZORDER_ORACLE = """
WITH dims AS (
  SELECT user_id % 256 AS zx,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 256 AS zy
  FROM events),
keyed AS (
  SELECT zx, zy, {zsql} AS zkey,
         zx BETWEEN 32 AND 47 AND zy BETWEEN 64 AND 95 AS hit
  FROM dims),
assigned AS (
  SELECT *,
         CAST(floor(zkey * 64 / 65536) AS BIGINT) AS file_z,
         CAST(floor(zx * 64 / 256) AS BIGINT) AS file_lin
  FROM keyed),
stats AS (
  SELECT 'zorder' AS layout, file_z AS file_id,
         min(zx) AS min_x, max(zx) AS max_x,
         min(zy) AS min_y, max(zy) AS max_y,
         count(*) AS rows_, sum(CASE WHEN hit THEN 1 ELSE 0 END) AS hits
  FROM assigned GROUP BY file_z
  UNION ALL
  SELECT 'linear', file_lin,
         min(zx), max(zx), min(zy), max(zy),
         count(*), sum(CASE WHEN hit THEN 1 ELSE 0 END)
  FROM assigned GROUP BY file_lin)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN min_x <= 47 AND max_x >= 32
                      AND min_y <= 95 AND max_y >= 64
                THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(sum(CASE WHEN min_x <= 47 AND max_x >= 32
                      AND min_y <= 95 AND max_y >= 64
                THEN rows_ ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(sum(hits) AS BIGINT) AS rows_matching
FROM stats GROUP BY layout
"""


def _finalize_zorder_oracle() -> None:
    from pero_ocr_spark.operators import zorder

    fn, _ = _REGISTRY["corpus_zorder_skipping"]
    _REGISTRY["corpus_zorder_skipping"] = (
        fn,
        _ZORDER_ORACLE.format(zsql=zorder.zorder_sql("zx", "zy", 8)),
    )


_finalize_zorder_oracle()


@register(
    "corpus_bucketed_join",
    _EXTRACTED_CTE
    + """
SELECT e.doc_id, d.lang, d.source,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN e.kind = 'media' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_media,
       CAST(sum(length(coalesce(e.text, ''))) AS BIGINT) AS sum_text_len
FROM extracted e
JOIN documents d ON d.doc_id = e.doc_id
GROUP BY 1, 2, 3
""",
)
def q_corpus_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Storage-partitioned (bucketed) co-located join: extracted spans
    # and document metadata are both written bucketed+sorted on doc_id
    # (Spark bucketBy == Iceberg bucket(N, key) transform), then the
    # recurring fact-fact enrich join + per-doc rollup runs as a
    # SortMergeJoin with ZERO Exchange nodes — at 10^12 docs neither
    # side broadcasts and neither side ever shuffles again after the
    # one clustered write at ingest. Plan shape pinned by
    # tests/test_colocate.py.
    import os

    from pero_ocr_spark.operators import colocate

    base = _scratch("bucketed_join")
    pid = os.getpid()
    spans_t = colocate.write_bucketed(
        corpus.extracted_spans(spark, sf_dir),
        f"spans_bkt_{pid}",
        os.path.join(base, "spans"),
    )
    docs_t = colocate.write_bucketed(
        _t(spark, sf_dir, "documents").select("doc_id", "lang", "source"),
        f"docs_bkt_{pid}",
        os.path.join(base, "docs"),
    )
    return colocate.colocated_span_enrich(spans_t, docs_t)


@register(
    "icetable_incremental_view",
    """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents GROUP BY source
""",
)
def q_icetable_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental materialized-view maintenance off the snapshot
    # table's changelog: the corpus lands in three append batches;
    # after each, the per-source rollup refreshes by reading ONLY the
    # (from, to] delta files (IceTable.incremental) and MERGEing the
    # delta aggregate into the persisted view (merge_rollup) — never
    # rescanning the base table. The final view must equal the
    # full-recompute oracle exactly; at 100 TB this is the difference
    # between O(ingest batch) and O(corpus) per refresh.
    from pero_ocr_spark.sources.icetable import IceTable, merge_rollup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    root = _scratch("icetable_incview")
    base = IceTable(root + "/base", stats_cols=("doc_id",))
    view = IceTable(root + "/view", stats_cols=("source",))
    seen = 0
    for r in range(3):
        base.commit(docs.filter(F.col("doc_id") % 3 == r).coalesce(2))
        head = base.current_version()
        delta = base.incremental(spark, seen, head)
        delta_agg = delta.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        )
        merge_rollup(spark, view, delta_agg, "source")
        seen = head
    return view.read(spark).select("source", "n_docs", "n_tokens")


@register(
    "icetable_changelog_cdc",
    """
SELECT doc_id, source, 'insert' AS _change_type,
       CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS _commit_version
FROM documents
UNION ALL
SELECT doc_id, source, 'delete', 3 FROM documents WHERE doc_id % 7 = 3
""",
)
def q_icetable_changelog_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # typed CDC stream off the snapshot table: two append commits, one
    # merge-on-read DELETE, then changelog(0, 3) emits every insert
    # with its commit version plus the deleted rows' PRE-DELETE images
    # reconstructed from the position-delete files (bytes ~ files
    # touched, never table size)
    from pero_ocr_spark.sources.icetable import IceTable

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    table = IceTable(_scratch("icetable_cdc"), stats_cols=("doc_id",))
    table.commit(docs.filter(F.col("doc_id") % 2 == 0).coalesce(2))
    table.commit(docs.filter(F.col("doc_id") % 2 == 1).coalesce(2))
    table.delete_where_mor(spark, "doc_id % 7 = 3")
    return table.changelog(spark, 0, 3).select(
        "doc_id", "source", "_change_type", "_commit_version"
    )
