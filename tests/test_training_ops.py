"""Incremental dedup, training-text rendering, context-window chunking."""

from __future__ import annotations

from pero_ocr_spark.operators import dedup, extract, textstats

HASH_P = 2_147_483_647


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_poly(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % HASH_P
    return h


def _py_fp(text: str) -> int | None:
    ws = text.split(" ")
    if len(ws) < 3:
        return None
    return min(
        _py_poly(" ".join(ws[i : i + 3])) for i in range(len(ws) - 2)
    )


def test_incremental_dedup_matches_python_model(spark):
    snap_rows = [(100, "a b c d"), (101, "x y z w v"), (102, "ok")]
    batch_rows = [
        (1, "a b c d"),        # exact copy of snapshot doc
        (2, "a b c d e"),      # near-dup (may share min shingle)
        (3, "p q r s t"),      # fresh
        (4, "p q r s t"),      # within-batch exact dup of 3
        (5, "hi"),             # < 3 words: no fingerprint, kept
        (6, "hi"),             # short within-batch dup of 5 -> dropped
        (7, "ok"),             # short exact copy of snapshot -> dropped
    ]
    got = {
        r.doc_id: r
        for r in dedup.incremental_dedup(
            _docs(spark, batch_rows), _docs(spark, snap_rows)
        ).collect()
    }
    snap_texts = {t for _, t in snap_rows}
    snap_fps = {_py_fp(t) for _, t in snap_rows} - {None}
    first_seen: dict[object, int] = {}
    for doc_id, text in batch_rows:
        key = _py_fp(text) if _py_fp(text) is not None else text
        if key not in first_seen:
            first_seen[key] = doc_id
    for doc_id, text in batch_rows:
        fp = _py_fp(text)
        key = fp if fp is not None else text
        r = got[doc_id]
        assert r.known_exact == (text in snap_texts), doc_id
        assert r.known_near == (fp in snap_fps), doc_id
        want_first = first_seen[key] == doc_id
        assert r.first_in_batch == want_first, doc_id
        want_keep = (
            (fp not in snap_fps)
            and (text not in snap_texts)
            and want_first
        )
        assert r.keep == want_keep, doc_id
    # sanity on the scenario itself
    assert got[1].known_exact and not got[1].keep
    assert got[3].keep and not got[4].first_in_batch
    assert got[5].keep
    assert not got[6].keep          # short within-batch dup caught
    assert got[7].known_exact and not got[7].keep  # short snapshot dup caught


def test_render_training_text_orders_and_sentinels(spark):
    spans = spark.createDataFrame(
        [
            (1, "text", "hello", None, 0),
            (1, "media", None, "img://1/1", 1),
            (1, "text", "world", None, 2),
            (2, "text", "solo", None, 0),
        ],
        "doc_id long, kind string, text string, media_ref string, ord long",
    )
    got = {
        r.doc_id: r for r in extract.render_training_text(spans).collect()
    }
    assert got[1].train_text == "hello <|image|> world"
    assert (got[1].n_text_spans, got[1].n_media_spans) == (2, 1)
    assert got[2].train_text == "solo"
    assert (got[2].n_text_spans, got[2].n_media_spans) == (1, 0)


def test_chunk_documents_overlap_and_coverage(spark):
    texts = {
        1: " ".join(f"w{i}" for i in range(5)),    # single short chunk
        2: " ".join(f"w{i}" for i in range(64)),   # exactly one window
        3: " ".join(f"w{i}" for i in range(65)),   # spills into chunk 2
        4: " ".join(f"w{i}" for i in range(130)),  # three chunks
    }
    out = textstats.chunk_documents(
        _docs(spark, list(texts.items())), max_tokens=64, overlap=8
    ).collect()
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")
        assert r.n_tokens == len(r.chunk_text.split(" "))
        assert r.n_tokens <= 64
    assert {d: len(c) for d, c in by_doc.items()} == {1: 1, 2: 1, 3: 2, 4: 3}
    for doc_id, text in texts.items():
        words = text.split(" ")
        chunks = [by_doc[doc_id][i] for i in sorted(by_doc[doc_id])]
        # stride 56: consecutive chunks share exactly the 8-token overlap
        rebuilt = chunks[0] + [w for c in chunks[1:] for w in c[8:]]
        assert rebuilt == words
        for a, b in zip(chunks, chunks[1:]):
            assert a[56:] == b[: len(a) - 56]


def test_media_context_pairs_nearest_text_neighbours(spark):
    from pero_ocr_spark.operators import media

    spans = spark.createDataFrame(
        [
            (1, "media", None, "img://1/0", 0),   # leading media: no prev
            (1, "text", "intro words", None, 1),
            (1, "media", None, "img://1/2", 2),
            (1, "text", "outro", None, 3),
            (2, "media", None, "img://2/0", 0),   # doc with no text at all
        ],
        "doc_id long, kind string, text string, media_ref string, ord long",
    )
    got = {
        (r.doc_id, r.ord): r
        for r in media.media_context_pairs(spans).collect()
    }
    assert set(got) == {(1, 0), (1, 2), (2, 0)}
    r = got[(1, 0)]
    assert (r.prev_text, r.next_text, r.caption) == (None, "intro words", "intro words")
    r = got[(1, 2)]
    assert (r.prev_text, r.next_text, r.caption) == ("intro words", "outro", "intro words")
    r = got[(2, 0)]
    assert (r.prev_text, r.next_text, r.caption) == (None, None, None)


def test_train_val_test_split_proportions_and_stability(spark):
    from pero_ocr_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, f"src{i % 20}") for i in range(2000)], "doc_id long, source string"
    )
    out = sampling.train_val_test_split(docs).collect()
    frac = {s: sum(r.split == s for r in out) / 2000 for s in ("train", "val", "test")}
    assert 0.05 < frac["test"] < 0.15 and 0.05 < frac["val"] < 0.15
    assert frac["train"] > 0.7
    # growth stability: the first 1000 docs keep their assignment
    sub = sampling.train_val_test_split(docs.filter("doc_id < 1000")).collect()
    full = {r.doc_id: r.split for r in out}
    assert all(full[r.doc_id] == r.split for r in sub)


def test_keep_best_per_cluster_prefers_quality_then_min_id(spark):
    from pero_ocr_spark.operators import dedup

    docs = _docs(spark, [(1, "a"), (2, "b"), (3, "c"), (9, "solo")])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    quality = spark.createDataFrame(
        [(1, 0.4), (2, 0.9), (3, 0.9), (9, 0.1)],
        "doc_id long, quality_prob double",
    )
    got = {
        r.doc_id: r
        for r in dedup.keep_best_per_cluster(docs, pairs, quality).collect()
    }
    # 1-2-3 one cluster: quality tie 2 vs 3 -> min id 2 wins
    assert [got[i].keep for i in (1, 2, 3)] == [False, True, False]
    assert got[1].n_members == 3 and got[1].cluster_id == got[3].cluster_id
    # singleton keeps itself regardless of score
    assert got[9].keep and got[9].n_members == 1
