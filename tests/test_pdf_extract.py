"""PDF text extraction (S3): the pure-Python decode ladder must handle a
real (tiny, structurally valid) Flate-compressed PDF — not only the
synthetic BT/ET fixture shape — and keep that legacy shape byte-identical."""

import zlib

import pytest

from supercrawler_spark import refspec


def _tiny_pdf(content: bytes, compress: bool = True) -> bytes:
    """A minimal structurally-valid one-page PDF wrapping ``content`` as the
    page content stream, with a correct xref table."""
    body_stream = zlib.compress(content) if compress else content
    filt = b" /Filter /FlateDecode" if compress else b""
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >>\nendobj\n",
        b"4 0 obj\n<< /Length " + str(len(body_stream)).encode() + filt
        + b" >>\nstream\n" + body_stream + b"\nendstream\nendobj\n",
    ]
    header, body, offsets = b"%PDF-1.4\n", b"", []
    for o in objs:
        offsets.append(len(header) + len(body))
        body += o
    xref_pos = len(header) + len(body)
    xref = b"xref\n0 5\n0000000000 65535 f \n" + b"".join(
        ("%010d 00000 n \n" % off).encode() for off in offsets)
    trailer = (b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n"
               + str(xref_pos).encode() + b"\n%%EOF\n")
    return header + body + xref + trailer


CONTENT = (b"BT /F1 12 Tf 72 720 Td (Hello ) Tj (\\(escaped\\) ) Tj "
           b"[ (Wor) -120 (ld) ] TJ <21> Tj ET")


def test_flate_compressed_pdf():
    got = refspec.extract_pdf_text(_tiny_pdf(CONTENT, compress=True))
    assert got == "Hello (escaped) World!"


def test_uncompressed_stream_pdf():
    got = refspec.extract_pdf_text(_tiny_pdf(CONTENT, compress=False))
    assert got == "Hello (escaped) World!"


def test_octal_and_continuation_escapes():
    content = b"BT (A\\101\\040B) Tj (cont\\\ninued) Tj ET"
    got = refspec.extract_pdf_text(_tiny_pdf(content))
    assert got == "AA B" + "continued"


def test_crlf_continuation_drops_both_chars():
    # PDF 32000-1 7.3.4.2: backslash + EOL (LF, CR, or CRLF) is a line
    # continuation — NEITHER char may reach the decoded text
    content = b"BT (AB\\\r\nCD) Tj (EF\\\rGH) Tj ET"
    got = refspec.extract_pdf_text(_tiny_pdf(content))
    assert got == "ABCD" + "EFGH"


def test_legacy_bt_et_shape_byte_identical():
    legacy = b"%PDF-1.4\nBT\ncrawl frontier words\nET\n%%EOF"
    assert refspec.extract_pdf_text(legacy) == "crawl frontier words"


def test_undecodable_pdf_raises():
    with pytest.raises(NotImplementedError):
        refspec.extract_pdf_text(b"%PDF-1.4 no streams here")


def test_pdf_to_mdx_wrapper():
    mdx = refspec.pdf_to_mdx("https://h.example.com/files/f1.pdf", "body text")
    assert mdx.startswith('---\ntitle: "PDF Document: f1.pdf"')
    assert mdx.endswith("body text")
