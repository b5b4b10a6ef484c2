"""HTML main-content extraction: boilerplate strip + DOM heuristics."""

from crrf_det_spark.htmlx import html_segments, looks_like_html


def test_dispatch_signal():
    assert looks_like_html("<html><body>x</body></html>")
    assert looks_like_html("<!DOCTYPE html><p>y</p>")
    assert looks_like_html("prefix <div class='a'>z</div>")
    assert not looks_like_html("plain text with a < b comparison")
    assert not looks_like_html("")
    assert not looks_like_html("a <- arrow, b <= c")
    # prose MENTIONING a tag must stay on the text-grid path
    assert not looks_like_html("use <div> for layout and <p> for paragraphs")
    assert not looks_like_html("the <table> element renders tabular data")
    # but an actual snippet (open + close) dispatches
    assert looks_like_html("<table><tr><td>x</td></tr></table>")


def test_structural_boilerplate_dropped():
    html = """
    <html><head><title>T</title><style>.x{}</style>
    <script>var a=1;</script></head>
    <body>
      <nav><a href="/">Home</a> <a href="/b">B</a></nav>
      <header>Site Header</header>
      <article><p>The actual article text, long enough to matter.</p>
      <p>Second paragraph of content.</p></article>
      <footer>copyright footer</footer>
    </body></html>"""
    segs = html_segments(html)
    contents = [s["content"] for s in segs]
    assert contents == [
        "The actual article text, long enough to matter.",
        "Second paragraph of content.",
    ]


def test_link_density_heuristic():
    html = """
    <body>
      <div><a href="1">one</a> <a href="2">two</a> <a href="3">three</a></div>
      <div>A real paragraph with plenty of plain text and only one
      <a href="x">link</a> inside it, which should be kept intact.</div>
    </body>"""
    segs = html_segments(html)
    assert len(segs) == 1
    assert segs[0]["content"].startswith("A real paragraph")
    assert "link" in segs[0]["content"]  # anchor text kept inside content


def test_table_extraction():
    html = """
    <body><p>intro text</p>
    <table>
      <tr><th>h1</th><th>h2</th></tr>
      <tr><td>a</td><td>1</td></tr>
      <tr><td>b</td><td>2</td></tr>
    </table>
    <p>outro text</p></body>"""
    segs = html_segments(html)
    assert [s["type"] for s in segs] == ["text", "table", "text"]
    t = segs[1]
    assert t["rows"] == [["h1", "h2"], ["a", "1"], ["b", "2"]]
    assert t["content"] == "h1\th2\na\t1\nb\t2"
    # reading order via synthesized boxes
    assert segs[0]["box"][0] < t["box"][0] < segs[2]["box"][0]


def test_nested_table_folds_into_cell():
    html = """
    <body><table>
      <tr><td>outer <table><tr><td>inner</td></tr></table></td>
          <td>plain</td></tr>
    </table></body>"""
    segs = html_segments(html)
    assert len(segs) == 1 and segs[0]["type"] == "table"
    assert segs[0]["rows"][0][1] == "plain"
    assert "outer" in segs[0]["rows"][0][0]


def test_entities_and_ragged_rows():
    html = """
    <body><p>A &amp; B &lt;ok&gt;</p>
    <table><tr><td>x</td><td>y</td></tr><tr><td>solo</td></tr></table>
    </body>"""
    segs = html_segments(html)
    assert segs[0]["content"] == "A & B <ok>"
    assert segs[1]["rows"] == [["x", "y"], ["solo", ""]]


def test_broken_markup_fallback_never_crashes():
    for bad in ("<div><p>unclosed", "<table><tr><td>x", "<<<>>>", "<p>&#x;</p>"):
        segs = html_segments(bad)
        assert isinstance(segs, list)
        for s in segs:
            assert s["type"] in ("text", "table")


def test_br_splits_blocks():
    segs = html_segments("<body><p>line one<br>line two</p></body>")
    assert [s["content"] for s in segs] == ["line one", "line two"]


def test_pre_block_gets_grid_table_detection():
    html = """
    <body><p>intro paragraph before the code block</p>
    <pre>Account      Q1      Q2
Revenue      100     200
Cost         40      90

Totals are preliminary and unaudited, pending further review.</pre>
    <p>after</p></body>"""
    segs = html_segments(html)
    types = [s["type"] for s in segs]
    assert "table" in types  # aligned monospace rows inside <pre>
    tbl = next(s for s in segs if s["type"] == "table")
    assert tbl["rows"][0] == ["Account", "Q1", "Q2"]
    # document order preserved: intro < pre content < after
    assert segs[0]["content"].startswith("intro")
    assert segs[-1]["content"] == "after"
    assert segs[0]["box"][0] < tbl["box"][0] < segs[-1]["box"][0]


def test_pre_preserves_whitespace_as_text():
    segs = html_segments(
        "<body><pre>def f(x):\n    return x + 1</pre></body>"
    )
    joined = " ".join(s["content"] for s in segs)
    assert "def" in joined and "return" in joined


def test_yield_guard_falls_back_to_grid():
    # an HTML-looking turn whose DOM parse would discard most characters
    # (payload hidden in a skip-tag) must fall back to the text-grid path
    from crrf_det_spark.extract import extract_turn, extract_turn_auto

    text = (
        "see <div>ok</div>\n<script>"
        + "var x = 1; " * 300
        + "</script>"
    )
    assert looks_like_html(text)  # dispatch signal alone would misfire
    assert extract_turn_auto(text) == extract_turn(text)


def test_yield_guard_keeps_dom_for_bare_table_fragment():
    # a short tag-dense fragment has little visible text but the DOM keeps
    # essentially all of it -> must stay on the DOM path (table structure)
    from crrf_det_spark.extract import extract_turn_auto

    segs = extract_turn_auto("<table><tr><td>Q1</td><td>100</td></tr></table>")
    assert [s["type"] for s in segs] == ["table"]
    assert segs[0]["rows"] == [["Q1", "100"]]


def test_yield_guard_keeps_dom_for_real_html():
    # genuine marker-less HTML keeps the DOM result: boilerplate strip is a
    # legitimate (bounded) char reduction
    from crrf_det_spark.extract import extract_turn_auto
    from crrf_det_spark.htmlx import html_segments

    text = (
        "<body><nav><a href='/'>home</a></nav><article><p>"
        + "actual content words here. " * 40
        + "</p></article><footer>fine print</footer></body>"
    )
    assert extract_turn_auto(text) == html_segments(text)


def test_markup_share_gate_keeps_text_turns_on_grid():
    # a turn that is overwhelmingly plain text with one tiny quoted tag
    # pair must run the text-grid kernel (layout analysis), even though
    # the DOM parse would retain the characters
    from crrf_det_spark.extract import extract_turn, extract_turn_auto

    lines = ["alpha beta gamma %d" % i for i in range(200)]
    text = "see <div>ok</div>\n" + "\n".join(lines)
    assert looks_like_html(text)
    assert extract_turn_auto(text) == extract_turn(text)
