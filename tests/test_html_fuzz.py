"""Property fuzz for the table/markdown parsers: invariants that hold
for ANY table, not a re-implementation of the parser (rectangularity,
text preservation, determinism, malformed-markup tolerance)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pero_ocr_spark.operators import html as H

cell = st.fixed_dictionaries(
    {
        "text": st.text(alphabet="abc xyz", min_size=0, max_size=8),
        "rowspan": st.integers(1, 3),
        "colspan": st.integers(1, 3),
        "header": st.booleans(),
    }
)
table = st.lists(st.lists(cell, min_size=1, max_size=5), min_size=1, max_size=6)


def render(rows, drop_closers=False):
    out = ["<table>"]
    for r in rows:
        out.append("<tr>")
        for c in r:
            tag = "th" if c["header"] else "td"
            out.append(
                f'<{tag} rowspan="{c["rowspan"]}" colspan="{c["colspan"]}">'
                + c["text"]
                + ("" if drop_closers else f"</{tag}>")
            )
        if not drop_closers:
            out.append("</tr>")
    out.append("</table>")
    return "".join(out)


def parse(markup):
    p = H._TableParser()
    p.feed(markup)
    return p.finish()


@settings(max_examples=120, deadline=None)
@given(table, st.booleans())
def test_table_parser_invariants(rows, drop_closers):
    markup = render(rows, drop_closers)
    tables = parse(markup)
    assert len(tables) == 1
    _, grid = tables[0]
    # rectangular
    widths = {len(r) for r in grid}
    assert len(widths) == 1
    # every anchor's (whitespace-normalized) text appears exactly once
    want = ["".join(c["text"].split()) for r in rows for c in r]
    got = ["".join(t.split()) for r in grid for _, t in r if t.split()]
    assert sorted(got) == sorted(t for t in want if t)
    # deterministic
    assert parse(markup) == tables


@settings(max_examples=60, deadline=None)
@given(table)
def test_grid_to_gfm_shape(rows):
    _, grid = parse(render(rows))[0]
    md = H._grid_to_gfm(grid)
    lines = md.split("\n")
    # header + separator + one line per body row
    body_rows = len(grid) - 1 if all(h for h, _ in grid[0]) else len(grid)
    assert len(lines) == 2 + body_rows
    # every line has the same unescaped-pipe count (rectangular markdown)
    pipes = {
        sum(
            1
            for i, ch in enumerate(line)
            if ch == "|" and (i == 0 or line[i - 1] != "\\")
        )
        for line in lines
    }
    assert len(pipes) == 1


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "<p>a b</p>",
                "<h2>t</h2>",
                "<ul><li>x</li></ul>",
                "<blockquote>q</blockquote>",
                '<img src="s">',
                "<table><tr><td>c</td></tr></table>",
                "<pre>k</pre>",
                "<p>",
                "</div>",
                "<a href='u'>w</a>",
            ]
        ),
        max_size=12,
    )
)
def test_markdown_parser_never_crashes_and_is_deterministic(frags):
    markup = "".join(frags)
    p1 = H._MarkdownParser()
    p1.feed(markup)
    p2 = H._MarkdownParser()
    p2.feed(markup)
    assert p1.finish() == p2.finish()
