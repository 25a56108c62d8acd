"""Totality fuzz for the pure-Python kernels (SURVEY §5.5 extension):
URL join and PDF decode must be TOTAL — any input yields a value (or the
documented NotImplementedError for undecodable PDFs), never a stray
exception, since a kernel crash inside the Arrow UDF would poison a whole
batch. Validated at 13k/9k examples out-of-band; kept at CI-sized counts
here."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from supercrawler_spark import refspec
from supercrawler_spark.functions.urls import rust_url_join, rust_url_parse

_host = st.from_regex(r"[a-z]([a-z0-9-]{0,10}[a-z0-9])?(\.[a-z]{2,6}){1,2}",
                      fullmatch=True)
_href = st.text(alphabet=string.ascii_letters + string.digits + "/.-_?&=#%:",
                max_size=30)


@given(_host, _href)
@settings(max_examples=300, deadline=None)
def test_url_join_total_and_fragment_free(host, href):
    base = rust_url_parse(f"https://{host}/a/b?q=1")
    assert base is not None
    j = rust_url_join(base, href, strip_fragment=True)
    if j is not None:
        assert "#" not in j
        assert rust_url_parse(j) is not None


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_pdf_extract_total(raw):
    try:
        out = refspec.extract_pdf_text(raw)
        assert isinstance(out, str)
    except NotImplementedError:
        pass


@given(st.binary(max_size=150))
@settings(max_examples=200, deadline=None)
def test_pdf_stream_segment_total(payload):
    raw = b"%PDF-1.4\nstream\n" + payload + b"\nendstream\n%%EOF"
    try:
        out = refspec.extract_pdf_text(raw)
        assert isinstance(out, str)
    except NotImplementedError:
        pass


@given(st.text(max_size=100))
@settings(max_examples=300, deadline=None)
def test_pdf_text_ops_total(content):
    r = refspec._pdf_text_ops(content)
    assert r is None or isinstance(r, str)


@given(st.text(max_size=40), _href)
@settings(max_examples=200, deadline=None)
def test_extract_kernel_total(body, href):
    html = (f'<html><head><title>t</title></head><body><p>{body}</p>'
            f'<a href="{href}">l</a></body></html>')
    u = "https://h.example.com/x"
    assert isinstance(refspec.clean_to_mdx(html, u), str)
    assert isinstance(refspec.extract_links(html, u), list)
