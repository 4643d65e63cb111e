"""HTML main-content extraction (DOM-heuristic boilerplate strip)."""

from __future__ import annotations

import pytest

from pero_ocr_spark.operators import html as H


# ------------------------------------------------------------------ parser

def _parse(markup: str):
    p = H._BlockParser()
    p.feed(markup)
    return p.finish()


def test_parser_segments_blocks_and_counts_links():
    blocks = _parse(
        '<html><body><nav><a href="/">home</a> <a href="/x">about</a></nav>'
        "<p>one two three</p><p>four <a>five six</a> seven</p></body></html>"
    )
    assert blocks == [
        ("nav", 2, 2, "home about"),
        ("p", 3, 0, "one two three"),
        ("p", 4, 2, "four five six seven"),
    ]


def test_parser_skips_script_style_head_and_decodes_entities():
    blocks = _parse(
        "<head><title>t</title><style>p{}</style></head>"
        "<body><script>var x = 'w';</script><p>a &amp; b</p></body>"
    )
    assert blocks == [("p", 3, 0, "a & b")]


def test_parser_tolerates_malformed_markup():
    # unclosed <p>, stray </em>, nested divs, self-closing br
    blocks = _parse(
        "<div><div><p>alpha beta</em><br/>gamma<div>delta</div></div>"
    )
    assert blocks == [("p", 3, 0, "alpha beta gamma"), ("div", 1, 0, "delta")]


def test_parser_text_outside_any_block_tag_lands_in_body():
    assert _parse("loose words <p>in p</p> tail") == [
        ("body", 2, 0, "loose words"),
        ("p", 2, 0, "in p"),
        ("body", 1, 0, "tail"),
    ]


def test_parser_link_spanning_blocks_does_not_leak_counts():
    # <a> left open across a block boundary: both blocks see link words
    blocks = _parse("<p><a>one two</p><p>three</a> four</p>")
    assert blocks == [("p", 2, 2, "one two"), ("p", 2, 1, "three four")]


# ---------------------------------------------------------------- classify

def _classify(spark, rows):
    df = spark.createDataFrame(
        [(0, i, t, txt, nw, lw) for i, (t, txt, nw, lw) in enumerate(rows)],
        "doc_id long, block_id int, tag string, text string, "
        "n_words int, n_link_words int",
    )
    got = H.classify_blocks(df).orderBy("block_id").collect()
    return [r.cls for r in got]


def test_classify_context_free_rules(spark):
    cls = _classify(
        spark,
        [
            ("nav", "home about contact", 3, 3),   # density 1 -> bad
            ("p", "w " * 8, 8, 0),                 # >= MIN_WORDS -> good
            ("p", "w " * 9, 9, 3),                 # density 1/3 -> not bad
        ],
    )
    assert cls == ["bad", "good", "good"]


def test_classify_short_blocks_inherit_from_nearest_decided(spark):
    cls = _classify(
        spark,
        [
            ("nav", "a b c", 3, 3),    # bad (decided)
            ("h1", "title here", 2, 0),  # short: next decided is good -> good
            ("p", "w " * 12, 12, 0),   # good (decided)
            ("p", "tail", 2, 0),       # short: prev decided good -> good
            ("aside", "x y z", 3, 3),  # bad
            ("li", "stray", 1, 0),     # short: nearest decided both bad -> bad
        ],
    )
    assert cls == ["bad", "good", "good", "good", "bad", "bad"]


def test_classify_all_short_doc_is_all_bad(spark):
    cls = _classify(spark, [("h1", "t", 1, 0), ("p", "a b", 2, 0)])
    assert cls == ["bad", "bad"]


# -------------------------------------------------------------- end-to-end

def _expected_main(text: str, source: str) -> tuple[str, int]:
    """Closed-form model of extract_main_content over synthesize_html."""
    words = text.split(" ")
    paras = [
        words[i : i + H.PARA_WORDS]
        for i in range(0, len(words), H.PARA_WORDS)
    ]
    kept = []
    if len(paras[0]) >= H.MIN_WORDS:  # h1 inherits from first paragraph
        kept.append(f"{source} report")
    for i, p in enumerate(paras):
        if len(p) >= H.MIN_WORDS or i > 0:
            kept.append(" ".join(p))
    return " ".join(kept), len(kept)


@pytest.mark.parametrize(
    "text",
    [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # 10
        " ".join(f"w{i}" for i in range(30)),  # 2.5 paragraphs, one linked
        "tiny doc",  # all-short -> everything stripped
        " ".join(f"w{i}" for i in range(24)),  # exactly 2 full paragraphs
    ],
)
def test_roundtrip_matches_closed_form(spark, text):
    docs = spark.createDataFrame(
        [(7, text, "src3")], "doc_id long, text string, source string"
    )
    got = H.extract_main_content(H.synthesize_html(docs)).collect()[0]
    want_text, want_kept = _expected_main(text, "src3")
    assert got.main_text == want_text
    assert got.n_kept == want_kept
    # nav + h1 + paragraphs + aside + footer all surfaced as blocks
    n_paras = (len(text.split(" ")) + H.PARA_WORDS - 1) // H.PARA_WORDS
    assert got.n_blocks == 4 + n_paras


def test_extract_on_corpus_sample(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    out = H.extract_main_content(H.synthesize_html(docs))
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        # furniture words never survive into main text
        assert "copyright" not in r.main_text
        assert "subscribe" not in r.main_text
        assert r.n_kept <= r.n_blocks


# ------------------------------------------------------ interleaved spans

def test_parser_emits_img_media_blocks_in_order():
    blocks = _parse(
        '<p>one two</p><img src="img://1/0"><p>three</p>'
        '<head><img src="skipme"></head>'
    )
    assert blocks == [
        ("p", 2, 0, "one two"),
        ("img", 0, 0, "img://1/0"),
        ("p", 1, 0, "three"),
    ]


def test_img_flushes_mid_block_text():
    blocks = _parse("<p>before <img src='x'> after</p>")
    assert blocks == [
        ("p", 1, 0, "before"),
        ("img", 0, 0, "x"),
        ("p", 1, 0, "after"),
    ]


def test_html_to_spans_interleaves_and_strips_furniture(spark):
    text = " ".join(f"w{i}" for i in range(30))  # paragraphs of 12/12/6
    docs = spark.createDataFrame(
        [(5, text, "src1")], "doc_id long, text string, source string"
    )
    rows = (
        H.html_to_spans(H.synthesize_html_interleaved(docs))
        .orderBy("ord")
        .collect()
    )
    kinds = [(r.ord, r.kind, r.text, r.media_ref) for r in rows]
    words = text.split(" ")
    assert kinds == [
        (0, "text", "src1 report", None),
        (1, "text", " ".join(words[0:12]), None),
        (2, "text", " ".join(words[12:24]), None),
        (3, "media", None, "img://5/1"),
        (4, "text", " ".join(words[24:30]), None),
    ]


# ------------------------------------------------------------- properties

def test_parser_conserves_words_on_random_nested_markup():
    """Every word inside non-skipped subtrees appears exactly once, in
    document order, across the emitted blocks — regardless of nesting,
    unclosed tags, or inline/block mixing."""
    import random

    rng = random.Random(42)
    block = ["div", "p", "li", "section", "td"]
    inline = ["span", "b", "em", "a"]
    counter = 0

    def gen(depth):
        nonlocal counter
        parts, words = [], []
        for _ in range(rng.randint(1, 4)):
            roll = rng.random()
            if roll < 0.45 or depth >= 4:
                n = rng.randint(1, 3)
                ws = [f"w{counter + k}" for k in range(n)]
                counter += n
                parts.append(" ".join(ws))
                words.extend(ws)
            elif roll < 0.75:
                t = rng.choice(block)
                sub, sw = gen(depth + 1)
                close = "" if rng.random() < 0.2 else f"</{t}>"
                parts.append(f"<{t}>{sub}{close}")
                words.extend(sw)
            else:
                t = rng.choice(inline)
                sub, sw = gen(depth + 1)
                parts.append(f"<{t}>{sub}</{t}>")
                words.extend(sw)
        return " ".join(parts), words

    for _ in range(25):
        counter = 0
        markup, want = gen(0)
        blocks = _parse(markup)
        got = [w for _, _, _, text in blocks for w in text.split(" ")]
        assert got == want
        assert all(nw == len(t.split(" ")) for _, nw, _, t in blocks)


# ------------------------------------------------------- template strip

def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, host string, html string")


def test_template_blocks_learns_per_host_chrome(spark):
    banner = "<div>please accept our cookie policy before you continue reading</div>"
    rows = [
        (i, "a.com", f"<body>{banner}<p>unique article {i} body text</p></body>")
        for i in range(4)
    ] + [
        # other host: same banner text on only 1 of 3 pages -> not template there
        (10, "b.com", f"<body>{banner}<p>b page ten</p></body>"),
        (11, "b.com", "<body><p>b page eleven</p></body>"),
        (12, "b.com", "<body><p>b page twelve</p></body>"),
    ]
    blocks = H.parse_html_blocks(_pages(spark, rows), carry=("host",))
    tpl = H.template_blocks(blocks).collect()
    assert [(r.host, r.doc_freq, r.host_docs) for r in tpl] == [("a.com", 4, 4)]


def test_strip_template_blocks_keeps_short_unique_content(spark):
    # the banner is long and link-free (jusText would keep it); the
    # content block is short (jusText context-free would hesitate) —
    # the template rule strips by repetition, not length
    banner = "<div>subscribe to our newsletter for weekly updates and offers</div>"
    rows = [
        (i, "h", f"<body>{banner}<p>note {i}</p></body>") for i in range(3)
    ]
    out = H.strip_template_blocks(_pages(spark, rows)).collect()
    assert sorted((r.doc_id, r.ord, r.text) for r in out) == [
        (0, 0, "note 0"), (1, 0, "note 1"), (2, 0, "note 2")
    ]


def test_strip_template_blocks_media_and_duplicate_content(spark):
    # an <img> repeated across pages (site logo) is stripped; a content
    # paragraph shared by 2 of 5 pages stays below the 0.5 bar
    shared = "<p>this exact paragraph appears on two different pages</p>"
    rows = [
        (i, "h",
         f'<body><img src="logo.png">{shared if i < 2 else f"<p>own {i}</p>"}'
         f"<p>tail {i}</p></body>")
        for i in range(5)
    ]
    out = H.strip_template_blocks(_pages(spark, rows)).collect()
    kinds = {(r.doc_id, r.ord): (r.kind, r.text or r.media_ref) for r in out}
    assert all(k[0] != "media" for k in kinds.values())  # logo gone
    assert kinds[(0, 0)] == ("text", "this exact paragraph appears on two different pages")
    assert kinds[(4, 0)] == ("text", "own 4")


# ---------------------------------------------------------------- outlinks

def _links(markup):
    p = H._BlockParser()
    p.feed(markup)
    p.finish()
    return p.links


def test_links_captured_in_document_order_with_anchors():
    assert _links(
        '<nav><a href="/">home</a> <a href="/x">go there</a></nav>'
        '<p>text <a href="b.html">rel link</a> tail</p>'
    ) == [("/", "home"), ("/x", "go there"), ("b.html", "rel link")]


def test_unclosed_and_nested_links_still_emit():
    # inner closes first (endtag order); unclosed outer emits at finish
    assert _links('<p><a href="/o">out <a href="/i">in</a></p>') == [
        ("/i", "in"), ("/o", "out")
    ]


def test_link_without_href_yields_empty_string():
    assert _links("<a>bare</a>") == [("", "bare")]


def test_resolve_href_rules(spark):
    rows = [(1, "#f"), (2, "http://other.com/p"), (3, "/abs"), (4, "rel.html")]
    df = spark.createDataFrame(rows, "doc_id long, href string")
    from pyspark.sql import functions as F
    out = {r.doc_id: r.url for r in df.select(
        "doc_id",
        H.resolve_href(
            F.col("href"), F.lit("h.com"), F.lit("https://h.com/doc/9")
        ).alias("url"),
    ).collect()}
    assert out == {
        1: "https://h.com/doc/9#f",
        2: "http://other.com/p",
        3: "https://h.com/abs",
        4: "https://h.com/rel.html",
    }


# --------------------------------------------------- densitometric classify

def test_densitometric_tree_branches(spark):
    # rows as (block_id, n_words, n_link_words); doc 1
    rows = [
        (0, 3, 3),    # ld=1.0 -> boilerplate (right branch)
        (1, 20, 0),   # prev ld=1.0>0.556: strict rule, nw<=40, next<=17 -> bp
        (2, 5, 0),    # prev nw=20>4 -> content (neighbour rescue)
        (3, 2, 0),    # prev nw=5>4 -> content
        (4, 2, 0),    # prev nw=2<=4, next=0 -> boilerplate
    ]
    df = spark.createDataFrame(
        [(1, b, "p", "t", nw, lw) for b, nw, lw in rows],
        "doc_id long, block_id int, tag string, text string, "
        "n_words int, n_link_words int",
    )
    out = {r.block_id: r.cls
           for r in H.classify_blocks_densitometric(df).collect()}
    assert out == {0: "boilerplate", 1: "boilerplate", 2: "content",
                   3: "content", 4: "boilerplate"}


def test_densitometric_high_prev_density_branch(spark):
    # prev ld > 0.555556: the stricter (nw>40 | next>17) rule applies
    rows = [
        (0, 4, 4),    # ld=1.0 boilerplate, sets pld=1.0 for next
        (1, 30, 0),   # strict rule: nw<=40 BUT next 50>17 -> content
        (2, 50, 0),   # prev ld=0; nw>16 -> content
        (3, 1, 4),    # ld>1/3 -> boilerplate
        (4, 30, 0),   # strict rule again (pld=4): nw<=40, next 0 -> bp
    ]
    df = spark.createDataFrame(
        [(1, b, "p", "t", nw, lw) for b, nw, lw in rows],
        "doc_id long, block_id int, tag string, text string, "
        "n_words int, n_link_words int",
    )
    out = {r.block_id: r.cls
           for r in H.classify_blocks_densitometric(df).collect()}
    assert out == {0: "boilerplate", 1: "content", 2: "content",
                   3: "boilerplate", 4: "boilerplate"}


def test_ensemble_template_vetoes_correlated_perpage_votes(spark):
    # a long link-free cookie banner on every page: jusText AND
    # densitometric both call it content (their shared blind spot) —
    # the template veto still strips it; short unique notes survive
    # via the jusText neighbour rescue (densitometric alone would
    # drop them)
    banner = ("we use cookies to improve your experience please accept "
              "our policy to continue enjoying this excellent site today")
    rows = [
        (i, "h",
         f"<body><div>{banner}</div><p>meaningful article number {i} "
         f"with enough words to stand decided alone</p><p>ps {i}</p></body>")
        for i in range(4)
    ]
    pages = spark.createDataFrame(rows, "doc_id long, host string, html string")
    out = [(r.doc_id, r.ord, r.text)
           for r in H.ensemble_extract(pages).collect()]
    texts = {t for _, _, t in out}
    assert not any("cookies" in t for t in texts)       # veto won
    assert any(t.startswith("meaningful") for t in texts)
    assert any(t.startswith("ps") for t in texts)       # neighbour rescue


# ------------------------------------------------------------- tables

def _tables(markup: str):
    p = H._TableParser()
    p.feed(markup)
    return p.finish()


def test_table_parser_simple_grid_with_header():
    out = _tables(
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>"
    )
    assert out == [
        (0, [[(True, "a"), (True, "b")], [(False, "1"), (False, "2")]])
    ]


def test_table_parser_expands_rowspan_and_colspan():
    out = _tables(
        '<table><tr><td rowspan="2">A</td><td colspan="2">B</td></tr>'
        "<tr><td>c</td><td>d</td></tr>"
        "<tr><td>e</td><td>f</td><td>g</td></tr></table>"
    )
    assert out[0][1] == [
        [(False, "A"), (False, "B"), (False, "")],
        [(False, ""), (False, "c"), (False, "d")],
        [(False, "e"), (False, "f"), (False, "g")],
    ]


def test_table_parser_rowspan_colspan_combo():
    out = _tables(
        '<table><tr><td rowspan="3" colspan="2">big</td><td>x</td></tr>'
        "<tr><td>y</td></tr><tr><td>z</td></tr>"
        "<tr><td>1</td><td>2</td><td>3</td></tr></table>"
    )
    assert out[0][1] == [
        [(False, "big"), (False, ""), (False, "x")],
        [(False, ""), (False, ""), (False, "y")],
        [(False, ""), (False, ""), (False, "z")],
        [(False, "1"), (False, "2"), (False, "3")],
    ]


def test_table_parser_nested_tables_and_order():
    out = _tables(
        "<table><tr><td>outer <table><tr><td>inner</td></tr></table>"
        "</td><td>x</td></tr></table>"
    )
    assert out == [
        (0, [[(False, "outer"), (False, "x")]]),
        (1, [[(False, "inner")]]),
    ]


def test_table_parser_tolerates_malformed_and_pads_ragged():
    # unclosed td/tr/table
    assert _tables("<table><tr><td>p<td>q<tr><td>r")[0][1] == [
        [(False, "p"), (False, "q")],
        [(False, "r"), (False, "")],
    ]
    # ragged rows pad to table width
    assert _tables(
        "<table><tr><td>1</td><td>2</td><td>3</td></tr>"
        "<tr><td>only</td></tr></table>"
    )[0][1] == [
        [(False, "1"), (False, "2"), (False, "3")],
        [(False, "only"), (False, ""), (False, "")],
    ]
    # bogus span attributes fall back to 1
    assert _tables(
        '<table><tr><td colspan="zap" rowspan="">x</td><td>y</td></tr></table>'
    )[0][1] == [[(False, "x"), (False, "y")]]
    assert _tables("<p>no tables here</p>") == []


def test_tables_to_markdown_spark(spark):
    pages = spark.createDataFrame(
        [
            (
                1,
                "<table><tr><th>k</th><th>v</th></tr>"
                "<tr><td>a|b</td><td>c</td></tr></table>",
            ),
            (2, "<table><tr><td>h</td><td>i</td></tr></table>"),
        ],
        "doc_id long, html string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in H.tables_to_markdown(H.parse_html_tables(pages)).collect()
    }
    # header row + pipe escaping
    assert got[1]["markdown"] == (
        "| k | v |\n| --- | --- |\n| a\\|b | c |"
    )
    assert (got[1]["n_rows"], got[1]["n_cols"]) == (2, 2)
    # no header row: empty GFM header synthesized
    assert got[2]["markdown"] == "|  |  |\n| --- | --- |\n| h | i |"
    assert (got[2]["n_rows"], got[2]["n_cols"]) == (1, 2)


# ---------------------------------------------------- markdown rendering

def _md(markup: str, **kw) -> str:
    p = H._MarkdownParser(**kw)
    p.feed(markup)
    return p.finish()


def test_markdown_renders_headings_links_lists_quotes_code():
    out = _md(
        "<h1>Title here</h1><p>one two</p>"
        "<p>pre <a href='#r'>anchor text</a> post</p>"
        "<ul><li>alpha</li><li>beta</li></ul>"
        "<ol><li>first</li><li>second</li></ol>"
        "<blockquote>quoted words</blockquote>"
        "<pre>code here</pre>"
    )
    assert out == (
        "# Title here\n\none two\n\npre [anchor text](#r) post\n\n"
        "- alpha\n- beta\n\n1. first\n2. second\n\n"
        "> quoted words\n\n```\ncode here\n```"
    )


def test_markdown_nested_list_indents():
    out = _md("<ul><li>a<ul><li>a1</li><li>a2</li></ul></li><li>b</li></ul>")
    assert out == "- a\n  - a1\n  - a2\n- b"


def test_markdown_drops_furniture_by_default():
    page = "<nav>menu here</nav><p>body text</p><footer>bye now</footer>"
    assert _md(page) == "body text"
    assert _md(page, drop_furniture=False) == "menu here\n\nbody text\n\nbye now"


def test_markdown_image_is_own_block_and_malformed_degrades():
    assert _md('<p>before</p><img src="img://1/0"><p>after words</p>') == (
        "before\n\n![](img://1/0)\n\nafter words"
    )
    # unclosed heading, paragraph, and link
    assert _md("<h2>head<p>para words<a href='x'>link words") == (
        "## head\n\npara words [link words](x)"
    )


def test_markdown_table_block_matches_distributed_renderer(spark):
    markup = (
        '<table><tr><th>k</th><th>v</th></tr>'
        '<tr><td rowspan="2">a|b</td><td>c</td></tr>'
        "<tr><td>d</td></tr></table>"
    )
    inline = _md(markup)
    pages = spark.createDataFrame([(1, markup)], "doc_id long, html string")
    dist = H.tables_to_markdown(H.parse_html_tables(pages)).collect()[0]
    assert inline == dist["markdown"]


# ----------------------------------------------------- page metadata

def test_meta_parser_collects_og_and_ld_json():
    p = H._MetaParser()
    p.feed(
        '<html><head><meta property="og:title" content="My Title">'
        '<meta name="date" content="2023-05-01">'
        '<meta property="og:title" content="SECOND IGNORED">'
        '<script type="application/ld+json">{"@type": "Article"}</script>'
        '<script type="application/ld+json">{"second": true}</script>'
        "</head><body><p>x</p></body></html>"
    )
    assert p.meta["og:title"] == "My Title"  # first wins
    assert p.meta["date"] == "2023-05-01"
    assert p.ld_json == '{"@type": "Article"}'  # first block only


def test_extract_page_metadata_fallback_and_nulls(spark):
    pages = spark.createDataFrame(
        [
            (1, '<head><meta name="date" content="2020-01-01"></head>'),
            (2, "<p>no metadata at all</p>"),
        ],
        "doc_id long, html string",
    )
    out = {r["doc_id"]: r for r in H.extract_page_metadata(pages).collect()}
    # article:published_time missing -> falls back to name="date"
    assert out[1]["article_date"] == "2020-01-01"
    assert out[1]["og_title"] is None
    assert out[2]["article_date"] is None and out[2]["ld_json"] is None
