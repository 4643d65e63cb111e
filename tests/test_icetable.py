"""Snapshot-table format (sources/icetable.py): atomic commits,
time travel, incremental reads, stats pruning, expiration."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pero_ocr_spark.sources.icetable import CommitConflict, IceTable


def _df(spark, lo, hi, tag="a"):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit(tag + "-"), F.col("id")).alias("text"),
        )
        .repartitionByRange(4, "doc_id")
    )


@pytest.fixture
def root(tmp_path):
    return str(tmp_path / "tbl")


@pytest.mark.usefixtures("spark")
class TestCommitRead:
    def test_append_roundtrip(self, spark, root):
        t = IceTable(root)
        v = t.commit(_df(spark, 0, 100))
        assert v == 1
        got = t.read(spark).orderBy("doc_id").collect()
        assert [r.doc_id for r in got] == list(range(100))

    def test_append_accumulates_and_time_travel(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        t.commit(_df(spark, 100, 150))
        assert t.read(spark).count() == 150
        # v1 read unchanged after the append: snapshot isolation
        assert t.read(spark, version=1).count() == 100
        assert t.snapshot(2)["summary"]["total_rows"] == 150

    def test_overwrite_replaces_live_set(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        t.commit(_df(spark, 500, 520), operation="overwrite")
        assert t.read(spark).count() == 20
        assert t.read(spark, version=1).count() == 100  # still travelable

    def test_schema_mismatch_rejected(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        bad = spark.range(5).select(F.col("id").alias("other"))
        with pytest.raises(ValueError, match="schema"):
            t.commit(bad)

    def test_empty_table_read_raises(self, spark, root):
        with pytest.raises(ValueError, match="empty"):
            IceTable(root).read(spark)


@pytest.mark.usefixtures("spark")
class TestConcurrency:
    def test_stale_expected_version_conflicts(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        t.commit(_df(spark, 10, 20))
        with pytest.raises(CommitConflict):
            t.commit(_df(spark, 20, 30), expected_version=1)

    def test_racing_snapshot_create_loses(self, spark, root):
        # simulate the loser of a commit race: the winner's snapshot
        # file already exists at the version this commit computes
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        winner = os.path.join(root, "metadata", "snap-2.json")
        with open(winner, "w") as f:
            json.dump(t.snapshot(1) | {"version": 2, "parent": 1}, f)
        # pointer still says 1, so the next commit targets v2 and must lose
        with pytest.raises(CommitConflict):
            t.commit(_df(spark, 10, 20))

    def test_version_hint_recovery(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        t.commit(_df(spark, 10, 20))
        os.unlink(os.path.join(root, "metadata", "version-hint.text"))
        assert t.current_version() == 2
        assert t.read(spark).count() == 20


@pytest.mark.usefixtures("spark")
class TestPlanning:
    def test_stats_pruning_skips_files(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 1000))  # range-clustered into 4 files
        all_files = t.files()
        assert len(all_files) == 4
        pruned = t.files(prune={"doc_id": (10, 20)})
        assert 0 < len(pruned) < len(all_files)
        # pruning is an optimization: with the exact predicate applied
        # the result equals the unpruned filtered read
        got = (
            t.read(spark, prune={"doc_id": (10, 20)})
            .filter(F.col("doc_id").between(10, 20))
            .count()
        )
        assert got == 11

    def test_planning_is_manifest_only(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        # files() answers from metadata even if the data moved away
        files = t.files()
        assert all(p.startswith(root) for p in files)
        assert t.snapshot(1)["summary"]["added_files"] == len(files)

    def test_incremental_reads_only_new_rows(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        t.commit(_df(spark, 100, 150))
        t.commit(_df(spark, 150, 170))
        inc = t.incremental(spark, 1, 3)
        assert sorted(r.doc_id for r in inc.collect()) == list(range(100, 170))
        assert t.incremental(spark, 2, 2).count() == 0

    def test_incremental_refuses_overwrite_span(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        t.commit(_df(spark, 10, 20), operation="overwrite")
        with pytest.raises(ValueError, match="overwrite"):
            t.incremental(spark, 1, 2)


@pytest.mark.usefixtures("spark")
class TestExpiration:
    def test_expire_keeps_kept_versions_readable(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        t.commit(_df(spark, 100, 150))
        t.commit(_df(spark, 150, 170))
        removed = t.expire_snapshots(keep_from=2)
        # v1's files are still referenced by v2/v3 chains -> kept
        assert removed == 0
        assert t.read(spark, version=2).count() == 150
        assert t.read(spark).count() == 170
        with pytest.raises(FileNotFoundError):
            t.snapshot(1)

    def test_expire_deletes_overwritten_files(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        t.commit(_df(spark, 500, 520), operation="overwrite")
        t.commit(_df(spark, 520, 540))
        removed = t.expire_snapshots(keep_from=2)
        assert removed == 4  # v1's four range-partitioned files
        assert t.read(spark).count() == 40
        assert t.read(spark, version=2).count() == 20

    def test_history_reflects_log(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        t.commit(_df(spark, 10, 20))
        t.commit(_df(spark, 0, 5), operation="overwrite")
        ops = [h["operation"] for h in t.history()]
        assert ops == ["append", "append", "overwrite"]


@pytest.mark.usefixtures("spark")
class TestCompaction:
    def test_compact_preserves_rows_and_shrinks_files(self, spark, root):
        t = IceTable(root)
        for lo in range(0, 100, 10):  # ten tiny appends -> >=10 files
            t.commit(_df(spark, lo, lo + 10).coalesce(1))
        assert len(t.files()) == 10
        v = t.compact(spark, target_files=2)
        assert len(t.files()) == 2
        got = sorted(r.doc_id for r in t.read(spark).collect())
        assert got == list(range(100))
        # pre-compaction snapshot still time-travels
        assert t.read(spark, version=v - 1).count() == 100
        # compaction restored range clustering -> pruning works again
        assert len(t.files(prune={"doc_id": (0, 10)})) == 1

    def test_compact_conflicts_with_concurrent_commit(self, spark, root):
        import json as _json
        import os as _os

        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        # a concurrent append wins version 2 while compact() is planning
        winner = _os.path.join(root, "metadata", "snap-2.json")
        with open(winner, "w") as f:
            _json.dump(t.snapshot(1) | {"version": 2, "parent": 1}, f)
        with pytest.raises(CommitConflict):
            t.compact(spark, target_files=1)


@pytest.mark.usefixtures("spark")
class TestRowLevelOps:
    def test_upsert_latest_wins_and_carries_untouched_files(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))  # 4 range-clustered files
        v1_files = set(t.files(1))
        # narrow update batch: keys 10..19 (one file's range) + new keys
        upd = _df(spark, 10, 20, tag="new").unionByName(
            _df(spark, 200, 205, tag="new")
        )
        v = t.upsert(upd)
        assert v == 2
        got = {r.doc_id: r.text for r in t.read(spark).collect()}
        assert len(got) == 105
        assert got[10] == "new-10" and got[15] == "new-15"
        assert got[9] == "a-9" and got[99] == "a-99"
        assert got[200] == "new-200"
        # file-level reuse: files whose range can't overlap are carried
        snap = t.snapshot(2)
        carried = {f["path"] for f in snap["manifest"]} & v1_files
        assert snap["summary"]["carried_files"] == len(carried) > 0
        # time travel still sees the pre-merge rows
        old = {r.doc_id: r.text for r in t.read(spark, version=1).collect()}
        assert old[10] == "a-10" and 200 not in old

    def test_upsert_empty_batch_is_noop(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        assert t.upsert(_df(spark, 0, 0)) == 1

    def test_upsert_into_empty_table_appends(self, spark, root):
        t = IceTable(root)
        assert t.upsert(_df(spark, 0, 10)) == 1
        assert t.read(spark).count() == 10

    def test_upsert_conflict_on_concurrent_commit(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 40))
        t2 = IceTable(root)
        t2.commit(_df(spark, 40, 50))  # advances to v2 behind t's back

        # upsert resolves base at call time, so a NEW race must land
        # between the base read and the publish; simulate by priming
        # base, then committing through the other handle
        import pero_ocr_spark.sources.icetable as it

        orig = it.IceTable.current_version
        calls = {"n": 0}

        def racy(self):
            v = orig(self)
            if calls["n"] == 0 and self is t:
                calls["n"] += 1
                t2.commit(_df(spark, 50, 60))
                return v
            return v

        it.IceTable.current_version = racy
        try:
            with pytest.raises(CommitConflict):
                t.upsert(_df(spark, 0, 5, tag="u"))
        finally:
            it.IceTable.current_version = orig

    def test_delete_where_rewrites_only_pruned_files(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        v1_files = set(t.files(1))
        v = t.delete_where(
            spark, "doc_id % 2 = 0 AND doc_id < 25", prune={"doc_id": (0, 24)}
        )
        assert v == 2
        got = sorted(r.doc_id for r in t.read(spark).collect())
        assert got == [i for i in range(100) if not (i % 2 == 0 and i < 25)]
        snap = t.snapshot(2)
        assert snap["summary"]["carried_files"] > 0
        assert {f["path"] for f in snap["manifest"]} & v1_files

    def test_delete_where_prune_miss_is_metadata_only(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        # predicate range outside every file's stats: no new snapshot
        assert t.delete_where(spark, "doc_id > 500", prune={"doc_id": (501, 999)}) == 1

    def test_expire_after_upsert_keeps_carried_files(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        t.upsert(_df(spark, 0, 5, tag="u"))
        removed = t.expire_snapshots(keep_from=2)
        assert removed > 0  # the rewritten file's old version is gone
        got = {r.doc_id: r.text for r in t.read(spark).collect()}
        assert got[0] == "u-0" and got[99] == "a-99" and len(got) == 100


@pytest.mark.usefixtures("spark")
class TestSchemaEvolution:
    def _df3(self, spark, lo, hi, tag="b"):
        return _df(spark, lo, hi, tag).withColumn("lang", F.lit("en"))

    def test_append_may_add_columns_old_files_project_null(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        t.commit(self._df3(spark, 10, 20))
        got = {r.doc_id: r.lang for r in t.read(spark).collect()}
        assert len(got) == 20
        assert got[5] is None and got[15] == "en"
        # time travel to v1 sees the ORIGINAL two-column schema
        assert t.read(spark, version=1).columns == ["doc_id", "text"]

    def test_append_dropping_a_column_rejected(self, spark, root):
        t = IceTable(root)
        t.commit(self._df3(spark, 0, 10))
        with pytest.raises(ValueError, match="ADD"):
            t.commit(_df(spark, 10, 20))

    def test_incremental_across_evolution_uses_target_schema(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        t.commit(self._df3(spark, 10, 20))
        inc = t.incremental(spark, 1, 2)
        assert inc.columns == ["doc_id", "text", "lang"]
        assert inc.count() == 10

    def test_upsert_with_evolved_batch(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 20))
        t.upsert(self._df3(spark, 5, 8, tag="u"))
        got = {r.doc_id: (r.text, r.lang) for r in t.read(spark).collect()}
        assert got[6] == ("u-6", "en")
        assert got[15] == ("a-15", None)


@pytest.mark.usefixtures("spark")
class TestMergeOnReadDeletes:
    """Position-delete files (Iceberg spec-v2 positional deletes):
    sparse deletes publish (file, row) pairs instead of rewriting
    data files; reads anti-join them; compaction folds them in."""

    def test_mor_delete_hides_rows_without_rewriting_data(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        files_before = set(t.files())
        v = t.delete_where_mor(spark, "doc_id % 10 = 3")
        assert v == 2
        # no data file was rewritten — the live data set is unchanged
        assert set(t.files()) == files_before
        got = sorted(r.doc_id for r in t.read(spark).collect())
        assert got == [i for i in range(100) if i % 10 != 3]
        # the delete is its own snapshot: time travel still sees v1
        assert t.read(spark, version=1).count() == 100
        assert t.snapshot(2)["summary"]["deleted_rows"] == 10
        assert t.snapshot(2)["summary"]["total_rows"] == 90

    def test_mor_deletes_accumulate_across_snapshots(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 50))
        t.delete_where_mor(spark, "doc_id < 5")
        t.delete_where_mor(spark, "doc_id >= 45")
        got = sorted(r.doc_id for r in t.read(spark).collect())
        assert got == list(range(5, 45))
        assert len(t.delete_files()) >= 2

    def test_overlapping_mor_deletes_count_exactly_once(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 40))
        t.delete_where_mor(spark, "doc_id < 20")
        v = t.delete_where_mor(spark, "doc_id < 30")  # overlaps first
        assert t.snapshot(v)["summary"]["deleted_rows"] == 10
        assert t.snapshot(v)["summary"]["total_rows"] == 10
        assert t.read(spark).count() == 10

    def test_mor_delete_matching_nothing_is_noop(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        assert t.delete_where_mor(spark, "doc_id > 999") == 1
        assert t.current_version() == 1

    def test_append_after_mor_delete_untouched(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        t.delete_where_mor(spark, "doc_id = 3")
        t.commit(_df(spark, 10, 20, tag="b"))
        got = sorted(r.doc_id for r in t.read(spark).collect())
        assert got == [i for i in range(20) if i != 3]
        assert t.snapshot(3)["summary"]["total_rows"] == 19

    def test_compact_folds_pending_deletes(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        t.delete_where_mor(spark, "doc_id % 2 = 1")
        v = t.compact(spark, target_files=2)
        assert t.delete_files(v) == []  # folded in, no MOR cost left
        got = sorted(r.doc_id for r in t.read(spark).collect())
        assert got == list(range(0, 100, 2))

    def test_upsert_after_mor_delete_does_not_resurrect(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        t.delete_where_mor(spark, "doc_id = 7")
        # update batch far from doc 7's file: its file is carried, the
        # carried delete must stay active
        t.upsert(_df(spark, 90, 95, tag="u"), key="doc_id")
        got = {r.doc_id: r.text for r in t.read(spark).collect()}
        assert 7 not in got
        assert got[92] == "u-92"
        # rewrite of doc 7's own file folds the delete for that file
        t.upsert(_df(spark, 7, 8, tag="back"), key="doc_id")
        got = {r.doc_id: r.text for r in t.read(spark).collect()}
        assert got[7] == "back-7"

    def test_cow_delete_after_mor_delete_composes(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 30))
        t.delete_where_mor(spark, "doc_id = 1")
        t.delete_where(spark, "doc_id >= 20")
        got = sorted(r.doc_id for r in t.read(spark).collect())
        assert got == [0] + list(range(2, 20))
        # cow rewrite applied + carried the pending delete correctly
        assert 1 not in got

    def test_mor_prune_narrows_scan(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))  # 4 range-clustered files
        t.delete_where_mor(spark, "doc_id = 99", prune={"doc_id": (90, 100)})
        assert t.read(spark).count() == 99

    def test_incremental_refuses_delete_span(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        t.delete_where_mor(spark, "doc_id = 0")
        t.commit(_df(spark, 10, 20))
        with pytest.raises(ValueError, match="delete"):
            t.incremental(spark, 1, 3)

    def test_expire_drops_dead_delete_files_keeps_live(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 20))
        t.delete_where_mor(spark, "doc_id = 5")          # v2
        del_path = t.delete_files(2)[0]["path"]
        t.commit(_df(spark, 20, 30))                     # v3
        # keep from v3: the delete file is still live via the chain
        t.expire_snapshots(keep_from=3)
        assert os.path.exists(del_path)
        assert sorted(r.doc_id for r in t.read(spark).collect()) == [
            i for i in range(30) if i != 5
        ]
        # fold + expire everything: the delete file becomes dead
        v = t.compact(spark, target_files=2)
        t.expire_snapshots(keep_from=v)
        assert not os.path.exists(del_path)

    def test_mor_summary_is_exact_after_partial_carry(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 100))
        t.delete_where_mor(spark, "doc_id IN (2, 93)")
        # upsert rewrites only the high-key file; delete file carried
        t.upsert(_df(spark, 95, 96, tag="u"), key="doc_id")
        assert t.read(spark).count() == 98


@pytest.mark.usefixtures("spark")
class TestBloomPointSkipping:
    """Per-file Bloom filters for point-lookup planning: min/max stats
    cannot prune a point probe on an uncluttered column; a 4 KB bloom
    per (file, column) answers 'definitely not here' from the manifest
    alone, driver-side, no job."""

    def _table(self, spark, root, n=400, files=8):
        t = IceTable(root, stats_cols=(), bloom_cols=("doc_id", "text"))
        df = _df(spark, 0, n).repartition(files, "text")  # not id-clustered
        t.commit(df)
        return t

    def test_point_lookup_prunes_files(self, spark, root):
        t = self._table(spark, root)
        total = len(t.files())
        planned = t.files(point={"doc_id": 123})
        assert total == 8 and len(planned) < total
        got = t.read(spark, point={"doc_id": 123}).filter("doc_id = 123")
        assert [r.text for r in got.collect()] == ["a-123"]

    def test_no_false_negatives_across_all_keys(self, spark, root):
        t = self._table(spark, root, n=100)
        for key in range(0, 100, 7):
            got = (
                t.read(spark, point={"doc_id": key})
                .filter(f"doc_id = {key}")
                .count()
            )
            assert got == 1, f"doc {key} lost by bloom planning"

    def test_absent_value_prunes_aggressively(self, spark, root):
        t = self._table(spark, root)
        # absent key: only bloom false positives survive planning
        assert len(t.files(point={"doc_id": 10_000_000})) <= 2

    def test_string_column_probe(self, spark, root):
        t = self._table(spark, root)
        planned = t.files(point={"text": "a-7"})
        assert len(planned) < 8
        assert (
            t.read(spark, point={"text": "a-7"})
            .filter("text = 'a-7'")
            .count()
            == 1
        )

    def test_blooms_carry_through_upsert(self, spark, root):
        t = IceTable(root, stats_cols=("doc_id",), bloom_cols=("doc_id",))
        t.commit(_df(spark, 0, 200).repartitionByRange(8, "doc_id"))
        t.upsert(_df(spark, 5, 6, tag="u"), key="doc_id")
        carried = [
            f for f in t._live_entries() if f.get("bloom")
        ]
        assert carried, "carried manifest entries must keep their blooms"
        # lookups still work against the mixed carried+rewritten set
        assert (
            t.read(spark, point={"doc_id": 150})
            .filter("doc_id = 150")
            .count()
            == 1
        )

    def test_files_without_bloom_are_never_pruned(self, spark, root):
        t = IceTable(root, stats_cols=(), bloom_cols=())  # no blooms
        t.commit(_df(spark, 0, 50))
        assert t.files(point={"doc_id": 3}) == t.files()


@pytest.mark.usefixtures("spark")
class TestWriteAuditPublish:
    """commit(audit=True) stages without moving the pointer; publish()
    fast-forwards it; abandon() frees a failed stage's version slot."""

    def test_staged_commit_is_invisible_until_published(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        v = t.commit(_df(spark, 10, 20), audit=True)
        assert v == 2
        assert t.current_version() == 1          # pointer unmoved
        assert t.read(spark).count() == 10       # readers see old head
        assert t.read(spark, version=v).count() == 20  # auditor sees stage
        t.publish(v)
        assert t.current_version() == 2
        assert t.read(spark).count() == 20

    def test_publish_requires_fast_forward(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        v = t.commit(_df(spark, 10, 20), audit=True)
        # audit takes long; someone else abandons the stage and commits
        t.abandon(v)
        t.commit(_df(spark, 50, 60))
        v2 = t.commit(_df(spark, 20, 30), audit=True)
        assert t.publish(v2) == 3
        assert sorted(r.doc_id for r in t.read(spark).collect()) == (
            list(range(10)) + list(range(20, 30)) + list(range(50, 60))
        )

    def test_publish_stale_stage_conflicts(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        # stage, then a competing commit moves the head: the commit
        # skips the staged slot (2) and publishes as version 3 — a
        # live stage never blocks writers
        v = t.commit(_df(spark, 10, 20), audit=True)
        assert t.commit(_df(spark, 30, 40)) == 3
        assert t.current_version() == 3
        assert t.read(spark).count() == 20  # 0-10 + 30-40
        with pytest.raises(CommitConflict):
            t.publish(v)  # head moved underneath the stage: re-stage
        t.abandon(v)  # cleanup; slot 2 stays a hole in the lineage
        assert [h["version"] for h in t.history()] == [1, 3]

    def test_crashed_auditor_never_wedges_writers(self, spark, root):
        # the round-4 advice scenario: an auditor stages and dies
        # without publish/abandon; every subsequent regular commit
        # must still land (previously the staged slot livelocked the
        # O_EXCL retry loop because current_version stayed at base)
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        t.commit(_df(spark, 10, 20), audit=True)  # auditor "crashes"
        for i in range(3):
            lo = 100 + 10 * i
            assert t.commit(_df(spark, lo, lo + 10)) == 3 + i
        assert t.read(spark).count() == 40
        # history shows only the published lineage; the stage is
        # still readable for a late audit via time travel
        assert [h["version"] for h in t.history()] == [1, 3, 4, 5]
        assert t.read(spark, version=2).count() == 20

    def test_abandon_removes_stage_data_keeps_parent(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        parent_files = set(t.files())
        v = t.commit(_df(spark, 10, 20), audit=True)
        removed = t.abandon(v)
        assert removed >= 1
        assert set(t.files()) == parent_files
        assert t.read(spark).count() == 10
        with pytest.raises(ValueError, match="published"):
            t.commit(_df(spark, 10, 20))  # regular commit reuses slot 2
            t.abandon(2)

    def test_recovery_scan_skips_staged(self, spark, root):
        t = IceTable(root)
        t.commit(_df(spark, 0, 10))
        t.commit(_df(spark, 10, 20), audit=True)
        os.unlink(os.path.join(root, "metadata", "version-hint.text"))
        assert t.current_version() == 1  # the stage is not the head

    def test_audited_quality_gate_end_to_end(self, spark, root):
        # the WAP loop: good batch passes audit -> published; poison
        # batch fails audit -> abandoned; table holds only audited data
        t = IceTable(root)
        good = _df(spark, 0, 50)
        v = t.commit(good, audit=True)
        audit_ok = t.read(spark, version=v).filter("text IS NULL").count() == 0
        assert audit_ok
        t.publish(v)
        poison = spark.range(50, 60).select(
            F.col("id").alias("doc_id"), F.lit(None).cast("string").alias("text")
        )
        v2 = t.commit(poison, audit=True)
        audit_ok = t.read(spark, version=v2).filter("text IS NULL").count() == 0
        assert not audit_ok
        t.abandon(v2)
        assert t.read(spark).count() == 50
        assert t.read(spark).filter("text IS NULL").count() == 0


@pytest.mark.usefixtures("spark")
class TestValueListPlanning:
    """Exact per-file distinct-value lists (the Iceberg partition-tuple
    analog) prune equality/IN predicates on low-cardinality columns."""

    def _table(self, spark, root):
        t = IceTable(root, stats_cols=(), value_cols=("lang",))
        df = spark.range(300).select(
            F.col("id").alias("doc_id"),
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("lang"),
        )
        t.commit(df.repartition(6, "lang"))
        return t

    def test_in_list_prunes_disjoint_files(self, spark, root):
        t = self._table(spark, root)
        total = len(t.files())
        planned = t.files(isin={"lang": ["de"]})
        assert 0 < len(planned) < total
        got = (
            t.read(spark, isin={"lang": ["de"]})
            .filter("lang = 'de'")
            .count()
        )
        assert got == 100

    def test_multi_value_probe_unions(self, spark, root):
        t = self._table(spark, root)
        got = (
            t.read(spark, isin={"lang": ["en", "fr"]})
            .filter("lang IN ('en', 'fr')")
            .count()
        )
        assert got == 200

    def test_high_cardinality_column_records_no_list(self, spark, root):
        t = IceTable(root, stats_cols=(), value_cols=("doc_id",))
        t.commit(
            spark.range(300).select(F.col("id").alias("doc_id")).coalesce(2)
        )
        # 150 distinct per file > MAX_VALUE_LIST: no list, never pruned
        assert all("values" not in f or not f["values"]
                   for f in t._live_entries())
        assert t.files(isin={"doc_id": [5]}) == t.files()


def test_merge_rollup_incremental_view(spark, tmp_path):
    from pero_ocr_spark.sources.icetable import IceTable, merge_rollup

    rows = [(i, f"w{i} " * (i % 4 + 1), f"s{i % 3}") for i in range(60)]
    docs = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows],
        "doc_id long, text string, source string",
    )
    base = IceTable(str(tmp_path / "base"), stats_cols=("doc_id",))
    view = IceTable(str(tmp_path / "view"), stats_cols=("source",))

    def agg(df):
        return df.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        )

    seen = 0
    for r in range(3):
        base.commit(docs.filter(F.col("doc_id") % 3 == r).coalesce(1))
        head = base.current_version()
        delta = base.incremental(spark, seen, head)
        merge_rollup(spark, view, agg(delta), "source")
        seen = head
        # after every refresh the view equals a full recompute so far
        want = {
            (r2["source"], r2["n_docs"], r2["n_tokens"])
            for r2 in agg(
                docs.filter((F.col("doc_id") % 3) <= r)
            ).collect()
        }
        got = {
            (r2["source"], r2["n_docs"], r2["n_tokens"])
            for r2 in view.read(spark).collect()
        }
        assert got == want, f"round {r}"
    # each refresh read only that round's delta files, never the table
    assert [len(base.snapshot(v)["manifest"]) for v in (1, 2, 3)] == [1, 1, 1]


def test_merge_rollup_leaves_untouched_keys_alone(spark, tmp_path):
    from pero_ocr_spark.sources.icetable import IceTable, merge_rollup

    view = IceTable(str(tmp_path / "v"), stats_cols=("k",))
    first = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20)], "k string, n long, tok long"
    )
    merge_rollup(spark, view, first, "k")
    # delta touches only 'b' and introduces 'c'; 'a' must survive as-is
    delta = spark.createDataFrame(
        [("b", 3, 30), ("c", 5, 50)], "k string, n long, tok long"
    )
    merge_rollup(spark, view, delta, "k")
    got = {(r["k"], r["n"], r["tok"]) for r in view.read(spark).collect()}
    assert got == {("a", 1, 10), ("b", 5, 50), ("c", 5, 50)}


def test_changelog_cdc_inserts_and_mor_deletes(spark, tmp_path):
    t = IceTable(str(tmp_path / "cdc"), stats_cols=("doc_id",))
    docs = spark.createDataFrame(
        [(i, f"t{i}", f"s{i % 2}") for i in range(20)],
        "doc_id long, text string, source string",
    )
    t.commit(docs.filter(F.col("doc_id") < 10).coalesce(1))     # v1
    t.commit(docs.filter(F.col("doc_id") >= 10).coalesce(1))    # v2
    t.delete_where_mor(spark, "doc_id % 5 = 2")                 # v3
    cl = t.changelog(spark, 0, 3).collect()
    ins = {(r["doc_id"], r["_commit_version"]) for r in cl
           if r["_change_type"] == "insert"}
    dels = {(r["doc_id"], r["_commit_version"], r["text"]) for r in cl
            if r["_change_type"] == "delete"}
    assert ins == {(i, 1 if i < 10 else 2) for i in range(20)}
    # deleted rows carry their PRE-delete images at the delete version
    assert dels == {(i, 3, f"t{i}") for i in range(20) if i % 5 == 2}
    # a window that skips the appends sees only the deletes
    only_del = t.changelog(spark, 2, 3).collect()
    assert {r["_change_type"] for r in only_del} == {"delete"}
    # empty window -> typed empty frame
    assert t.changelog(spark, 3, 3).count() == 0


def test_changelog_refuses_overwrite_snapshots(spark, tmp_path):
    t = IceTable(str(tmp_path / "cdc2"), stats_cols=("doc_id",))
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id long, text string"
    )
    t.commit(docs.coalesce(1))
    t.upsert(
        spark.createDataFrame([(1, "rev")], "doc_id long, text string"),
        key="doc_id",
    )  # overwrite snapshot
    with pytest.raises(ValueError, match="changelog reads span"):
        t.changelog(spark, 0, t.current_version())
