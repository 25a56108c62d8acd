"""Unit tests for the executable extraction spec (refspec.py), table-driven
from the cited reference code paths (SURVEY.md §2.6, src/supercrawler.rs)."""

import pytest

from supercrawler_spark import refspec

from supercrawler_spark.refspec import (
    clean_to_mdx,
    element_to_markdown,
    extract_links,
    infer_code_language,
    parse_html,
    pdf_to_mdx,
    process_element,
    url_to_filename,
)
from supercrawler_spark.functions.urls import (
    canonicalize_url,
    rust_url_join,
    rust_url_parse,
    url_host,
)


def _first_body_el(html):
    doc = parse_html(html)
    body = doc.select_first(lambda el: el.tag == "body")
    return next(ch for ch in body.children if ch.is_element)


def render(html):
    return process_element(_first_body_el(f"<html><body>{html}</body></html>"))


# ---- X1 element_to_markdown (rs:81-131) ----

@pytest.mark.parametrize("html,expected", [
    ("<p>plain text</p>", "plain text\n\n"),
    ("<p><strong>bold</strong> and <b> b </b></p>", "**bold** and **b**\n\n"),
    ("<p><em>it</em> <i>i</i></p>", "*it* *i*\n\n"),
    ("<p><code> x&lt;1 </code></p>", "`x<1`\n\n"),
    ("<p>a<br>b</p>", "a\nb\n\n"),
    ("<p><span>sp</span>anned</p>", "spanned\n\n"),
    ("<p><a href='/x'>lnk</a></p>", "[lnk](/x)\n\n"),
    ("<p><a href='/x'>  </a>after</p>", "after\n\n"),      # empty link text skipped
    ("<p><a>noref</a></p>", "[noref](#)\n\n"),              # missing href → '#'
    ("<p><strong>  </strong>x</p>", "x\n\n"),               # empty strong skipped
    ("<p><u>under</u></p>", "under\n\n"),                   # unknown inline → recurse
])
def test_inline(html, expected):
    assert render(html) == expected


# ---- X2 headings / paragraphs / lists (rs:136-168) ----

@pytest.mark.parametrize("html,expected", [
    ("<h1>T</h1>", "# T\n\n"),
    ("<h3>T</h3>", "### T\n\n"),
    ("<h6>T</h6>", "###### T\n\n"),
    ("<h2></h2>", ""),
    ("<p>  </p>", ""),
    ("<ul><li>a</li><li>b</li></ul>", "* a\n* b\n\n"),
    ("<ul><li></li></ul>", ""),
    ("<ol><li>a</li><li></li><li>c</li></ol>", "1. a\n2. c\n\n"),  # counter skips empty
])
def test_blocks(html, expected):
    assert render(html) == expected


# ---- X3 code language inference (rs:170-213) ----

@pytest.mark.parametrize("cls,lang", [
    ("language-python", "python"),
    ("lang-RUST", "rust"),
    ("highlight jsx", "jsx"),
    ("typescript", "tsx"),
    ("listing-ts", "tsx"),          # substring 'ts'
    ("shell-session", "bash"),      # substring 'sh'
    ("py-block", "python"),
    ("rs-code", "rust"),
    ("htmlmixed", "html"),
    ("css-x", "css"),
    ("plain", ""),
])
def test_lang_inference(cls, lang):
    assert infer_code_language(cls) == lang


def test_pre_code():
    assert render("<pre><code class='language-go'>x := 1</code></pre>") == "```go\nx := 1\n```\n\n"
    assert render("<pre><code>import React from 'react'</code></pre>") == \
        "```jsx\nimport React from 'react'\n```\n\n"
    assert render("<pre>raw text</pre>") == "```\nraw text\n```\n\n"
    assert render("<pre><code>  </code></pre>") == ""


# ---- X2 img / a / blockquote (rs:215-248) ----

def test_img_a_blockquote():
    assert render("<img src='/i.png' alt='x'>") == "![x](/i.png)\n\n"
    assert render("<img src='' alt='x'>") == ""
    assert render("<img src='/' alt='x'>") == ""
    assert render("<img src='/i.png'>") == "![](/i.png)\n\n"
    assert render("<a href='/x'>text</a>") == "[text](/x)\n\n"
    assert render("<a href='#'>text</a>") == ""
    assert render("<a href='/x'></a>") == ""
    assert render("<blockquote><p>a</p><p>b</p></blockquote>") == "> a\n> \n> b\n\n"
    assert render("<blockquote><p></p></blockquote>") == ""


# ---- X4 tables (rs:250-310) ----

def test_table_thead():
    got = render("<table><thead><tr><th>A</th><td>B</td></tr></thead>"
                 "<tbody><tr><td>1</td><td>2</td><td>3</td></tr></tbody></table>")
    assert got == "| A | B |\n| --- | --- |\n| 1 | 2 |\n\n"  # rows truncated to header width


def test_table_first_row_th():
    got = render("<table><tr><th>A</th><th>B</th></tr><tr><td>1</td></tr></table>")
    assert got == "| A | B |\n| --- | --- |\n| 1 |  |\n\n"   # padded to header width


def test_table_headerless():
    got = render("<table><tr><td>1</td><td>2</td></tr><tr><td>3</td></tr></table>")
    assert got == "| 1 | 2 |\n| 3 |\n\n"


def test_table_empty():
    assert render("<table></table>") == ""


# ---- WHATWG implied-end-tag recovery (html5ever parity on malformed
# markup: unclosed li/td/tr/dt/option, nested p, heading-in-heading) ----

@pytest.mark.parametrize("html,expected", [
    # unclosed <li>: each start closes the open sibling (list scope)
    ("<ul><li>one<li>two<li>three</ul>", "* one\n* two\n* three\n\n"),
    ("<ol><li>a<li>b</ol>", "1. a\n2. b\n\n"),
    # unclosed <td>/<tr>: same cells html5ever builds
    ("<table><tr><td>1<td>2<tr><td>3<td>4</table>",
     "| 1 | 2 |\n| 3 | 4 |\n\n"),
    ("<table><tr><th>A<th>B<tr><td>1<td>2</table>",
     "| A | B |\n| --- | --- |\n| 1 | 2 |\n\n"),
])
def test_malformed_list_table_recovery(html, expected):
    assert render(html) == expected


def test_unclosed_markup_equals_wellformed_render():
    """The recovery contract stated directly: dropping the explicit close
    tags must not change the extraction."""
    cases = [
        ("<ul><li>a<ul><li>b</ul>",
         "<ul><li>a<ul><li>b</li></ul></li></ul>"),
        ("<ul><li>one<li>two</ul>", "<ul><li>one</li><li>two</li></ul>"),
        ("<table><tr><td>1<td>2<tr><td>3<td>4</table>",
         "<table><tr><td>1</td><td>2</td></tr>"
         "<tr><td>3</td><td>4</td></tr></table>"),
        ("<div><p>first para here<p>second para here</div>",
         "<div><p>first para here</p><p>second para here</p></div>"),
    ]
    for malformed, wellformed in cases:
        assert render(malformed) == render(wellformed), malformed


def test_malformed_paragraph_and_heading_recovery():
    # <p> start closes an open <p>: siblings, two paragraphs
    assert render("<div><p>first para here<p>second para here</div>") == \
        "first para here\n\nsecond para here\n\n"
    # heading start pops an open heading — never nests
    doc = parse_html("<html><body><h1>a<h2>b</body></html>")
    body = doc.select_first(lambda el: el.tag == "body")
    tags = [ch.tag for ch in body.children if ch.is_element]
    assert tags == ["h1", "h2"]
    # stray </p> synthesizes an empty <p> (text-invisible, no crash)
    assert render("<div></p>some loose text!</div>") == "some loose text!\n\n"


def test_malformed_dt_dd_option_tree_shape():
    doc = parse_html("<html><body><dl><dt>t1<dd>d1<dt>t2<dd>d2</dl>"
                     "<select><option>x<option>y</select></body></html>")
    dl = doc.select_first(lambda el: el.tag == "dl")
    assert [ch.tag for ch in dl.children if ch.is_element] == \
        ["dt", "dd", "dt", "dd"]
    sel = doc.select_first(lambda el: el.tag == "select")
    opts = [ch for ch in sel.children if ch.is_element]
    assert [o.tag for o in opts] == ["option", "option"]
    assert [o.all_text() for o in opts] == ["x", "y"]


def test_table_foster_parenting_equals_wellformed():
    """WHATWG foster parenting: non-whitespace text / non-table elements
    inside table internals are hoisted immediately before the table —
    the malformed page must extract byte-identically to the page that
    already has the content before the table."""
    BASE = "https://example.com/x"
    cases = [
        # stray character run directly inside <table>
        ("<table>stray loose text here!<tr><td>1<td>2</table>",
         "stray loose text here!"
         "<table><tr><td>1</td><td>2</td></tr></table>"),
        # stray element (div) inside <table>
        ("<table><div><p>div before the table</p></div><tr><td>1</table>",
         "<div><p>div before the table</p></div>"
         "<table><tr><td>1</td></tr></table>"),
        # a foster-parented <p> left open is popped by the next <td>
        # ("clear the stack back to a table row context")
        ("<table><tr><p>para before the table<td>cell</table>",
         "<p>para before the table</p>"
         "<table><tr><td>cell</td></tr></table>"),
    ]
    for malformed, wellformed in cases:
        a = clean_to_mdx(f"<html><head></head><body>{malformed}</body></html>", BASE)
        b = clean_to_mdx(f"<html><head></head><body>{wellformed}</body></html>", BASE)
        assert a == b, malformed


def test_table_foster_parenting_tree_shape():
    # whitespace-only runs inside table internals stay in place (spec) and
    # are invisible; the table renders normally
    assert render("<table> <tr> <td>1</td> </tr> </table>") == "| 1 |\n\n"
    # text is hoisted BEFORE the table node in the body
    doc = parse_html("<html><body><table>hoist me now please!"
                     "<tr><td>c</td></tr></table></body></html>")
    body = doc.select_first(lambda el: el.tag == "body")
    kinds = [(ch.tag, ch.text.strip()) for ch in body.children]
    assert kinds[0] == (None, "hoist me now please!")
    assert kinds[1][0] == "table"
    # a stray <td> with NO open table must not pop document structure or
    # foster anything — it stays where it is
    doc = parse_html("<html><body><div><td>x</td>"
                     "some real paragraph text</div></body></html>")
    div = doc.select_first(lambda el: el.tag == "div")
    assert div is not None
    assert [ch.tag for ch in div.children if ch.is_element] == ["td"]
    assert "some real paragraph text" in div.all_text()


def test_adoption_agency_misnested_formatting():
    """<b>x<i>y</b>z</i>: html5ever closes the <i> with the <b> and
    reconstructs a fresh <i> around the following content — z stays
    italic. Verified tree shape AND rendered emphasis markers."""
    assert render("<p><b>x<i>y</i></b><i>z</i></p>") == \
        render("<p><b>x<i>y</b>z</i></p>")  # equality with well-formed twin
    doc = parse_html("<html><body><p><b>x<i>y</b>z</i></p></body></html>")
    p = doc.select_first(lambda el: el.tag == "p")
    kids = [ch.tag for ch in p.children if ch.is_element]
    assert kids == ["b", "i"]  # reconstructed <i> sibling, b keeps i(y)


def test_adoption_agency_lazy_no_empty_clones():
    # a cancelled pending element (</i> before any content) must create
    # NO node — an eager empty clone would fabricate elements
    doc = parse_html("<html><body><p><b>x<i>y</b></i>done</p></body></html>")
    p = doc.select_first(lambda el: el.tag == "p")
    assert [ch.tag for ch in p.children if ch.is_element] == ["b"]
    assert render("<p><b>x<i>y</b></i>done</p>") == "**x*y***done\n\n"
    # reconstructed <a> must not duplicate hrefs in link extraction
    html = ('<html><head></head><body><p><a href="https://e.com/x">x<b>y'
            '</a>after</b></p></body></html>')
    links = extract_links(html, "https://e.com/")
    assert links.count("https://e.com/x") == 1


def test_adoption_agency_formatting_persists_into_next_block():
    # after the misnested close, the pending <i> reconstructs inside the
    # NEXT paragraph's character run (active-formatting semantics)
    got = render("<div><p><b>x<i>y</b><p>still italic text</div>")
    assert "**x*y***" in got and "*still italic text*" in got


def test_extract_page_fields_shared_parse_parity():
    """The shared-parse fast path (noise strip is a no-op → one tree serves
    MDX and links) must be byte-identical to the two-parse kernels, on
    clean, noisy, and malformed pages, for both engine variants."""
    from supercrawler_spark.refspec import extract_page_fields
    bodies = [
        '<p>some paragraph of text</p><a href="/x">x</a>',             # fast path
        '<script>var x=1;</script><p>para</p><a href="/y">y</a>'
        "<style>.c{color:red}</style>",                                 # fallback
        '<table>stray text goes here!<tr><td><a href="/z">z</a></table>',  # malformed
        '<p><b>x<i>y</b>z</i><a href="/w">w</a></p>',                   # adoption
    ]
    for b in bodies:
        full = f"<html><head><title>t</title></head><body>{b}</body></html>"
        for variant in ("supercrawler", "main"):
            mdx, links = extract_page_fields(full, "https://e.com/a",
                                             variant=variant)
            assert mdx == clean_to_mdx(full, "https://e.com/a",
                                       variant=variant), (b, variant)
            assert links == extract_links(full, "https://e.com/a"), b


def test_implied_closes_scope_bounded():
    # a <td> in an OUTER table must not be closed by a <td> inside a
    # nested table (the inner tr/table is the scope barrier)
    doc = parse_html("<html><body><table><tr><td>out"
                     "<table><tr><td>in1<td>in2</table>"
                     "</td></tr></table></body></html>")
    tables = doc.select(lambda el: el.tag == "table")
    outer_tds = [el for el in tables[0].descendants() if el.tag == "td"]
    inner_tds = [el for el in tables[1].descendants() if el.tag == "td"]
    assert len(inner_tds) == 2
    # the outer cell still CONTAINS the inner table
    assert any(el.tag == "table" for el in outer_tds[0].descendants())


def test_li_scope_stops_at_table_cell():
    """List-item scope includes the base in-scope barriers (td/th/table/
    caption): a <li> start inside a table nested in an open <li> must not
    close the outer item and pop the table (WHATWG; html5ever parity)."""
    doc = parse_html("<html><body><ul><li>a<table><tr><td>"
                     "<li>x</li></td></tr></table></li></ul></body></html>")
    td = doc.select_first(lambda el: el.tag == "td")
    assert td is not None
    inner = [el for el in td.descendants() if el.tag == "li"]
    assert len(inner) == 1 and inner[0].all_text() == "x"
    # and the outer li still contains the whole table
    outer_li = doc.select_first(lambda el: el.tag == "li")
    assert any(el.tag == "table" for el in outer_li.descendants())


def test_li_scope_special_barrier_vs_div_exception():
    """WHATWG li start scan: ANY special element except address/div/p ends
    the scan — <section> keeps the outer li open; <div> is the documented
    exception and the outer li closes across it."""
    d1 = parse_html("<html><body><ul><li>a<section><li>b</section>"
                    "</li></ul></body></html>")
    lis = d1.select(lambda el: el.tag == "li")
    assert len(lis) == 2
    sec = d1.select_first(lambda el: el.tag == "section")
    assert [el.tag for el in sec.descendants()] == ["li"]
    d2 = parse_html("<html><body><ul><li>a<div><li>b</ul></body></html>")
    ul = d2.select_first(lambda el: el.tag == "ul")
    assert [el.tag for el in ul.children if el.is_element] == ["li", "li"]


# ---- container/blocklist/loose text (rs:311-343) ----

def test_container_loose_text():
    # trimmed byte length must exceed 10
    assert render("<div>exactly10!</div>") == ""
    assert render("<div>exactly11!!</div>") == "exactly11!!\n\n"
    assert render("<div><p>x</p>tiny</div>") == "x\n\n"
    assert render("<nav><p>gone</p></nav>") == ""
    assert render("<form><p>gone</p></form>") == ""
    assert render("<article><p>kept</p></article>") == "kept\n\n"
    assert render("<details><p>kept</p></details>") == "kept\n\n"  # unknown → container


# ---- X5 clean_to_mdx (rs:347-500) ----

BASE = "https://example.com/page"


def test_frontmatter_defaults():
    mdx = clean_to_mdx("<html><head></head><body></body></html>", BASE)
    assert mdx == (
        '---\ntitle: "Untitled"\ndescription: "No description available"\n'
        'keywords: "No keywords available"\nsourceUrl: "https://example.com/page"\n'
        f'canonicalUrl: "{BASE}"\n---'
    )


def test_frontmatter_fields_and_escaping():
    html = ('<html><head><title>A "B"</title>'
            '<meta name="description" content="d1">'
            '<meta name="keywords" content="k1,k2">'
            '<meta name="author" content="au">'
            '<meta property="article:published_time" content="2024-01-01">'
            '<link rel="canonical" href="https://c.example/x">'
            '</head><body></body></html>')
    mdx = clean_to_mdx(html, BASE)
    assert 'title: "A \\"B\\""' in mdx
    assert 'description: "d1"' in mdx
    assert 'keywords: "k1,k2"' in mdx
    assert 'author: "au"' in mdx
    assert 'date: "2024-01-01"' in mdx
    assert 'canonicalUrl: "https://c.example/x"' in mdx


def test_description_fallback_truncation():
    long_p = "x" * 300
    html = f"<html><head></head><body><p>{long_p}</p></body></html>"
    mdx = clean_to_mdx(html, BASE)
    assert f'description: "{"x" * 250}..."' in mdx


def test_description_meta_document_order():
    # selector group matches first meta in document order across alternatives
    html = ('<html><head>'
            '<meta property="og:description" content="og-first">'
            '<meta name="description" content="named">'
            '</head><body></body></html>')
    assert 'description: "og-first"' in clean_to_mdx(html, BASE)


def test_toc_marker():
    heads = "".join(f"<h2>h{i}</h2>" for i in range(4))
    mdx = clean_to_mdx(f"<html><head></head><body>{heads}</body></html>", BASE)
    assert "## Table of Contents\n\n<!-- toc -->" in mdx
    mdx3 = clean_to_mdx("<html><head></head><body><h2>a</h2><h2>b</h2><h2>c</h2></body></html>", BASE)
    assert "Table of Contents" not in mdx3


def test_main_content_scoping():
    html = ('<html><head><meta name="description" content="d"></head>'
            '<body><p>outside</p>'
            '<main><p>inside</p></main></body></html>')
    mdx = clean_to_mdx(html, BASE)
    assert "inside" in mdx and "outside" not in mdx


def test_main_content_class_selector():
    html = ('<html><head><meta name="description" content="d"></head>'
            '<body><p>outside</p>'
            '<div class="page-content extra"><p>inside</p></div></body></html>')
    mdx = clean_to_mdx(html, BASE)
    assert "inside" in mdx and "outside" not in mdx


def test_related_resources():
    html = ('<html><head></head><body><p>body text</p>'
            '<div class="related"><a href="/r1">R1</a></div>'
            '<a rel="related" href="https://other.example/r2#f">R2</a>'
            '</body></html>')
    mdx = clean_to_mdx(html, BASE)
    assert "\n## Related Resources\n\n" in mdx
    assert "- [R1](https://example.com/r1)\n" in mdx
    # absolutization keeps fragments (only rel-extraction strips them? no —
    # related links keep the joined URL as-is, rs:474-477)
    assert "- [R2](https://other.example/r2#f)" in mdx


def test_noise_regex_no_dotall():
    # single-line script removed by the regex
    html = ('<html><head></head><body><p>keep</p>'
            "<script>var x = 'inline';</script></body></html>")
    mdx = clean_to_mdx(html, BASE)
    assert "inline" not in mdx
    # multi-line script survives the regex (Rust `.` ≠ \n) but is blocklisted in X2
    html2 = ('<html><head></head><body><p>keep</p>'
             "<script>\nvar y = 1;\n</script></body></html>")
    mdx2 = clean_to_mdx(html2, BASE)
    assert "var y" not in mdx2 and "keep" in mdx2


def test_blank_collapse():
    html = "<html><head></head><body><div><p>a</p></div><div></div><p>b</p></body></html>"
    mdx = clean_to_mdx(html, BASE)
    assert "\n\n\n" not in mdx


# ---- X6 extract_links (rs:736-757) ----

def test_extract_links_prefilter_and_join():
    html = ('<html><body>'
            '<a href="/a">1</a>'
            '<a href="b/c">2</a>'
            '<a href="#frag">3</a>'
            '<a href="javascript:void(0)">4</a>'
            '<a href="mailto:x@y">5</a>'
            '<a href="">6</a>'
            '<a href="https://Other.Example:443/Z#f">7</a>'
            '<a href="../up">8</a>'
            '<a>nohref</a>'
            '</body></html>')
    links = extract_links(html, "https://example.com/dir/page")
    assert links == [
        "https://example.com/a",
        "https://example.com/dir/b/c",
        "https://other.example/Z",
        "https://example.com/up",
    ]


def test_extract_links_duplicates_preserved_in_doc_order():
    html = '<html><body><a href="/a">1</a><a href="/a">2</a></body></html>'
    assert extract_links(html, "https://e.com/") == ["https://e.com/a", "https://e.com/a"]


# ---- X7 url_to_filename (rs:527-562) ----

@pytest.mark.parametrize("url,expected", [
    ("https://example.com/a/b", "./output/example.com/a_b.mdx"),
    ("https://example.com/", "./output/example.com/index.mdx"),
    ("https://example.com/a?x=1&y=2", "./output/example.com/a_x_1_y_2.mdx"),
    ("https://example.com/" + "p" * 200, "./output/example.com/" + "p" * 99 + ".mdx"),
    ("not a url", "./output/invalid_url/notaurl.mdx"),
])
def test_url_to_filename(url, expected):
    assert url_to_filename(url) == expected


# ---- X8 pdf wrapper (rs:720-723) ----

def test_pdf_to_mdx():
    got = pdf_to_mdx("https://e.com/doc/file.pdf", "BODY")
    assert got == ('---\ntitle: "PDF Document: file.pdf"\n'
                   'description: "Extracted text from PDF."\n'
                   'sourceUrl: "https://e.com/doc/file.pdf"\n---\n\nBODY')


# ---- F4 canonicalization ----

@pytest.mark.parametrize("url,expected", [
    ("HTTPS://Example.COM:443/a/./b/../c?q=2#frag", "https://example.com/a/c?q=2"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/a?utm_source=t&q=1&fbclid=z", "https://example.com/a?q=1"),
    ("https://example.com/a?utm_source=t", "https://example.com/a"),
    ("javascript:void(0)", None),
    ("not a url", None),
])
def test_canonicalize(url, expected):
    assert canonicalize_url(url) == expected


def test_canonicalize_parity_mode_keeps_tracking():
    assert canonicalize_url("https://e.com/a?utm_source=t", strip_tracking=False) == \
        "https://e.com/a?utm_source=t"


def test_url_host():
    assert url_host("https://A.B.example.com/x") == "a.b.example.com"
    assert url_host(":::") is None


def test_join_relative_forms():
    base = rust_url_parse("https://e.com/d1/d2/page?old=1")
    assert rust_url_join(base, "x") == "https://e.com/d1/d2/x"
    assert rust_url_join(base, "/abs") == "https://e.com/abs"
    assert rust_url_join(base, "?q=2") == "https://e.com/d1/d2/page?q=2"
    assert rust_url_join(base, "//other.com/p") == "https://other.com/p"
    assert rust_url_join(base, "../up") == "https://e.com/d1/up"
    assert rust_url_join(base, "a#f", strip_fragment=True) == "https://e.com/d1/d2/a"
    assert rust_url_join(base, "") == "https://e.com/d1/d2/page?old=1"


# --------------------------------------------------------------------------
# Fast tokenizer ≡ stdlib tokenizer (parse_html vs parse_html_stdlib)
# --------------------------------------------------------------------------

def _tree_sig(node):
    """Full structural signature: (tag, sorted attrs, text, children)."""
    return (node.tag,
            tuple(sorted(node.attrs.items())) if node.is_element else None,
            None if node.is_element else node.text,
            tuple(_tree_sig(c) for c in node.children))


def _assert_same_tree(html):
    fast = refspec.parse_html(html)
    slow = refspec.parse_html_stdlib(html)
    assert _tree_sig(fast) == _tree_sig(slow), html[:200]


TRICKY_HTML = [
    # strict-grammar pages (fast path must take them)
    '<html><head><title>T &amp; U</title></head><body><p>a&lt;b</p></body></html>',
    '<body><a href="/x?a=1&amp;b=2">l</a><img src=pic.png alt="A &quot;q&quot;"></body>',
    "<body><a href='s.html' rel=nofollow>x</a><br/><hr /></body>",
    '<body><script>var a = "<b>not bold</b>";</script><p>after</p></body>',
    '<body><style>p > a { color: red }</style><p>styled</p></body>',
    '<body><SCRIPT TYPE="text/javascript">x < y && z</SCRIPT>ok</body>',
    '<!DOCTYPE html><html><body><!-- a comment --><p>c</p></body></html>',
    '<body><p>1 < 2 and 3 > 2</p></body>',            # bare '<' as data
    '<body><p>tail<',                                  # lone '<' at EOF
    '<body><input type=checkbox checked><p>v</p></body>',  # valueless attr
    '<body><a href="">empty</a><a href=x/>slashval</a></body>',
    '<body><p>&#65;&#x42;&amp;&nbsp;&unknown;</p></body>',
    '<?xml version="1.0"?><body><p>pi</p></body>',
    '<body></><p>after-empty-end</p></body>',          # </> dropped
    '<body><script>never closed',                      # unclosed cdata: dropped
    '<body><p>a</p></body><!-- unterminated',          # fallback: comment
    '<body><td></p art=1></body>',                     # fallback: bogus end tag
    '<body><p class=a=b>x</p></body>',                 # fallback: '=' in value
    '<body><p data-x=`tick`>x</p></body>',             # fallback: backtick
    '<body><a/href=x>y</a></body>',                    # fallback: slash-sep attrs
    '<body><![CDATA[raw]]><p>m</p></body>',            # fallback: marked section
    '<body><a b="x>y">gt-in-quotes</a></body>',
    '<body><script>x</scripty></script>ok</body>',     # fallback: cdata bogus end
    '<div a="1" a="2">dup</div>',
    '<body><p>multi\nline\ntext</p></body>',
    '<body><em>x<strong>y</em>z</strong></body>',      # adoption agency path
    '<table><tr><td>a<td>b<tr><td>c</table>',          # implied closes
    '<p>one<p>two<div>three</div>',
    '<body><A HREF="/UP">caps</A></body>',
]


def test_fast_tokenizer_matches_stdlib_on_battery():
    for html in TRICKY_HTML:
        _assert_same_tree(html)


def test_fast_tokenizer_takes_fast_path_on_clean_page():
    """The strict grammar must actually cover a normal page (no fallback),
    otherwise the fast path is dead code."""
    html = ('<html><head><title>t</title><meta name="description" '
            'content="d"></head><body><p>hello &amp; goodbye</p>'
            '<a href="/x">l</a><script>var i=0;</script></body></html>')
    builder = refspec._TreeBuilder()
    refspec._feed_fast(builder, html)   # must not raise
    assert _tree_sig(builder.root) == _tree_sig(refspec.parse_html_stdlib(html))


def test_fast_tokenizer_matches_stdlib_on_corpus():
    """Every page of the synthetic corpus must parse to the identical tree
    on both tokenizer paths, and extract_page_fields must be byte-identical."""
    from supercrawler_spark.sources import synth
    corpus = synth.generate_corpus(0.001, with_goldens=False)
    for p in corpus.pages:
        _assert_same_tree(p.html)


def _render_body(body_html):
    """Whole-body MDX (frontmatter stripped) — unlike ``render`` above,
    which renders only the first body element."""
    full = f"<html><head></head><body>{body_html}</body></html>"
    return clean_to_mdx(full, "https://e.com/").split("---\n\n", 1)[1]


def test_implied_close_requeues_formatting():
    """html5ever keeps formatting cut by an IMPLIED block close in the
    active formatting list — `<p><b>x<p>y` renders y bold (divergence
    class (1) from rounds 2-3, now closed)."""
    assert _render_body("<p><b>x<p>y") == \
        _render_body("<p><b>x</b></p><p><b>y</b></p>")
    assert "**y**" in _render_body("<p><b>x<p>y")
    # nested formatting re-queues outermost-first
    assert "***y***" in _render_body("<p><b><i>x<p>y")
    # explicit close BEFORE the implied close: nothing re-queued
    assert "**y**" not in _render_body("<p><b>x</b><p>y")
    # pending entry cancelled by its own later end tag
    assert "**y**" not in _render_body("<p><b>x<p></b>y")
    # li sibling-implied closes carry formatting into the next li
    assert _render_body("<ul><li><em>a<li>b</ul>") == \
        _render_body("<ul><li><em>a</em></li><li><em>b</em></li></ul>")
    # block start closing <p> carries formatting into the block: the
    # malformed input must equal its well-formed html5ever twin (a bare
    # <i> under a container renders PLAIN per the reference's
    # process_element, so twin-equality is the parity statement)
    assert _render_body("<p><i>x<div>eleven bytes plus</div>") == \
        _render_body("<p><i>x</i></p><div><i>eleven bytes plus</i></div>")


def test_formatting_never_leaks_across_table_cells():
    """WHATWG markers: formatting opened inside a td must not reconstruct
    in the next cell, nor escape a closed table."""
    # td -> td implied close: second cell NOT bold
    got = _render_body("<table><tr><td><b>x<td>y</table>")
    assert "**x**" in got and "**y**" not in got
    # </table> with the cell's <b> still open: following text NOT bold
    got = _render_body("<table><tr><td><b>x</table>here is the aftertext")
    assert "here is the aftertext" in got and \
        "**here is the aftertext**" not in got
    # tr -> tr implied close across rows: not bold
    got = _render_body("<table><tr><td><b>x<tr><td>y</table>")
    assert "**y**" not in got


def _doc_shape(html):
    """(tag, children-shapes) over elements + text markers, doc order."""
    def shape(n):
        if not n.is_element:
            return ("#text", n.text)
        return (n.tag, tuple(shape(c) for c in n.children))
    return tuple(shape(c) for c in parse_html(html).children)


def test_body_synthesis_fragment_and_empty():
    """html5ever materializes html>head>body for ANY input (WHATWG
    before-html/before-head/in-head/after-head modes); fragment HTML and
    the empty string must parse to that shape — the could-not-parse
    branch is dead in the reference and must be dead here."""
    assert _doc_shape("") == (("html", (("head", ()), ("body", ()))),)
    assert _doc_shape("   \n  ") == (("html", (("head", ()), ("body", ()))),)
    frag = _doc_shape("<p>hello</p>")
    assert frag == (("html", (("head", ()),
                              ("body", (("p", (("#text", "hello"),)),)))),)
    # bare text fragment
    assert _doc_shape("plain") == \
        (("html", (("head", ()), ("body", (("#text", "plain"),)))),)
    # MDX must carry the fragment text, never the error branch
    mdx = clean_to_mdx("<p>a fragment paragraph body</p>", "https://e.com/f")
    assert "Could not parse" not in mdx
    assert "a fragment paragraph body" in mdx
    assert "Could not parse" not in clean_to_mdx("", "https://e.com/e")


def test_head_synthesis_and_head_only_tags():
    # head-only tags before body content go into a synthesized <head>;
    # the first body-content token implies </head> + <body>
    got = _doc_shape("<meta charset='u'><title>T</title><p>x")
    assert got == (("html", (
        ("head", (("meta", ()), ("title", (("#text", "T"),)))),
        ("body", (("p", (("#text", "x"),)),)))),)
    # explicit head, fragment body content after it
    got = _doc_shape("<head><title>T</title></head><p>x")
    assert got[0][1][0][0] == "head" and got[0][1][1][0] == "body"
    # title-only document still ends with an (empty) body
    assert _doc_shape("<title>T</title>")[0][1][1] == ("body", ())


def test_trailing_content_after_body_close_stays_in_body():
    """html5ever: </body>/</html> only switch insertion mode — trailing
    markup keeps inserting at the current node inside the body subtree."""
    doc = parse_html("<html><body><p>one para of text</p></body>"
                     "<p>late arrival text</p></html>")
    body = doc.select_first(lambda el: el.tag == "body")
    assert [c.tag for c in body.children if c.is_element] == ["p", "p"]
    # with an element still open at </body>, content continues inside it
    doc = parse_html("<body><div>x</body>tail")
    div = doc.select_first(lambda el: el.tag == "div")
    assert div.all_text() == "xtail"
    mdx = clean_to_mdx("<html><body><p>one para of text</p></body>"
                       "<p>late arrival text here</p></html>",
                       "https://e.com/t")
    assert "late arrival text here" in mdx


def test_duplicate_html_body_head_ignored():
    # re-opened html/body/head merge into the first element (never nest)
    doc = parse_html("<body><p>a</p><body class='x'><p>b</p></body></body>")
    bodies = doc.select(lambda el: el.tag == "body")
    assert len(bodies) == 1
    assert [c.tag for c in bodies[0].children if c.is_element] == ["p", "p"]
    doc = parse_html("<html><body>x</body></html><html><body>y</body></html>")
    assert len(doc.select(lambda el: el.tag == "body")) == 1
    assert doc.select_first(lambda el: el.tag == "body").all_text() == "xy"


def test_explicit_body_without_head_synthesizes_head():
    """before-head mode inserts a head for ANY token including <body>:
    html5ever always yields html>head>body, even when the input opens
    with an explicit <body> and never mentions <head>."""
    assert _doc_shape("<body><p>x</p></body>") == \
        (("html", (("head", ()), ("body", (("p", (("#text", "x"),)),)))),)
    assert _doc_shape("<html><body><p>x") == \
        (("html", (("head", ()), ("body", (("p", (("#text", "x"),)),)))),)
    # explicit head still not duplicated
    got = _doc_shape("<head></head><body><p>x")
    assert got[0][1][0] == ("head", ())
    assert sum(1 for c in parse_html("<body>x").children[0].children
               if c.tag == "head") == 1


def test_reopened_doc_tags_merge_missing_attrs():
    """WHATWG in-body: a duplicate <html>/<body> start tag keeps the
    existing element but adds each attribute not already present on it
    (html5ever does the same); a duplicate <head> is ignored outright."""
    doc = parse_html("<body class=a><p>x</p><body class=b id=z><p>y</p>")
    body = doc.select_first(lambda el: el.tag == "body")
    assert body.attrs == {"class": "a", "id": "z"}
    doc = parse_html("<html lang=en><body>x</body></html>"
                     "<html lang=fr data-k=v><body>y</body></html>")
    html_el = doc.select_first(lambda el: el.tag == "html")
    assert html_el.attrs == {"lang": "en", "data-k": "v"}
    # duplicate head: attributes dropped, element unchanged
    doc = parse_html("<head id=h1><title>T</title></head>"
                     "<head id=h2 cls=x></head><p>x")
    head = doc.select_first(lambda el: el.tag == "head")
    assert head.attrs == {"id": "h1"}
    # deep-in-tree duplicate body also merges
    doc = parse_html("<body><div><body id=late>x</div>")
    assert doc.select_first(lambda el: el.tag == "body").attrs == \
        {"id": "late"}


def test_body_synthesis_fast_path_equals_stdlib():
    for html in ["", "   ", "<p>frag", "plain", "<title>T</title>",
                 "<meta name='a' content='b'><p>x",
                 "<body><div>x</body>tail",
                 "<head><title>T</title></head><p>after",
                 "<body><p>x</p></body>",
                 "<body class=a>x<body class=b id=z>y",
                 "<html lang=en><p>x</html><html lang=fr id=q>",
                 "<p>a<body class='late'>b"]:
        assert _tree_sig(refspec.parse_html(html)) == \
            _tree_sig(refspec.parse_html_stdlib(html)), html
