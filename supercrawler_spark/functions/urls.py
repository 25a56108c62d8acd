"""URL parsing / normalization mirroring the reference's `url` crate behavior.

The reference canonicalizes URLs implicitly via ``Url::parse(s)?.to_string()``
(WHATWG URL: lowercased scheme+host, default port stripped, dot segments
resolved, empty path → "/") at seed enqueue (src/supercrawler.rs:1241-1252)
and link enqueue (src/supercrawler.rs:1338,1342), joins relatives via
``base.join(href)`` (src/supercrawler.rs:746), and strips fragments with
``set_fragment(None)`` (src/supercrawler.rs:748).

``canonicalize_url`` additionally strips tracking query params (utm_*, gclid,
fbclid, msclkid) — a north-rule extension beyond the reference, switchable off
for reference-parity runs.

Pure stdlib; called from vectorized pandas UDFs (functions/udfs.py) and the
pure-Python oracle BFS (sources/synth.py).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

_SPECIAL_PORTS = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21}

# WHATWG path percent-encode set (subset sufficient for the crawl corpus;
# existing %XX escapes are left untouched, as the url crate does)
_PATH_ENCODE = set(' "<>`{}|\\^')
_QUERY_ENCODE = set(' "<>#\'')
_FRAGMENT_ENCODE = set(' "<>`')


def _pct_encode(s: str, encode_set: set[str]) -> str:
    out = []
    for ch in s:
        cp = ord(ch)
        if cp <= 0x1F or cp == 0x7F or cp > 0x7E or ch in encode_set:
            out.extend(f"%{b:02X}" for b in ch.encode("utf-8"))
        else:
            out.append(ch)
    return "".join(out)


def _resolve_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments (WHATWG-equivalent here)."""
    output: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if output:
                output.pop()
        elif buf == "/..":
            buf = "/"
            if output:
                output.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            i = buf.find("/", 1) if buf.startswith("/") else buf.find("/")
            if i == -1:
                output.append(buf)
                buf = ""
            else:
                output.append(buf[:i])
                buf = buf[i:]
    return "".join(output)


@dataclass(frozen=True)
class ParsedUrl:
    scheme: str
    host: str
    port: Optional[int]
    path: str
    query: Optional[str]
    fragment: Optional[str]
    # userinfo preserved verbatim (the url crate keeps it in to_string();
    # dropping it would diverge the seen-set key for credentialed URLs).
    # WHATWG additionally percent-encodes some userinfo chars — out of
    # scope for the crawl corpus, preserved as-is.
    userinfo: Optional[str] = None

    def to_string(self) -> str:
        s = f"{self.scheme}://"
        if self.userinfo:
            s += f"{self.userinfo}@"
        s += self.host
        if self.port is not None:
            s += f":{self.port}"
        s += self.path
        if self.query is not None:
            s += f"?{self.query}"
        if self.fragment is not None:
            s += f"#{self.fragment}"
        return s


def rust_url_parse(url: str) -> Optional[ParsedUrl]:
    """Parse + normalize an absolute special-scheme URL the way
    ``Url::parse(s)?.to_string()`` does; None on anything it would reject."""
    if url is None:
        return None
    # WHATWG input preprocessing: trim C0/space at the EDGES, then remove
    # tab/LF/CR ANYWHERE (an href split across source lines still parses)
    s = url.strip()
    s = s.replace("\t", "").replace("\n", "").replace("\r", "")
    i = s.find(":")
    if i <= 0:
        return None
    scheme = s[:i].lower()
    if not scheme[0].isalpha() or not all(c.isalnum() or c in "+-." for c in scheme):
        return None
    if scheme not in _SPECIAL_PORTS:
        return None  # non-special schemes (javascript:, mailto:) are prefiltered
    rest = s[i + 1:]
    # WHATWG "special authority ignore slashes": for special schemes ANY
    # run of / or \ (including none) after the colon separates scheme from
    # authority — Url::parse accepts "http:example.com" and "http:/a/b"
    j = 0
    while j < len(rest) and rest[j] in "/\\":
        j += 1
    rest = rest[j:]
    # split authority / path / query / fragment
    frag: Optional[str] = None
    fi = rest.find("#")
    if fi != -1:
        frag = rest[fi + 1:]
        rest = rest[:fi]
    query: Optional[str] = None
    qi = rest.find("?")
    if qi != -1:
        query = rest[qi + 1:]
        rest = rest[:qi]
    si = rest.find("/")
    if si == -1:
        authority, path = rest, ""
    else:
        authority, path = rest[:si], rest[si:]
    userinfo: Optional[str] = None
    if "@" in authority:
        userinfo, authority = authority.rsplit("@", 1)
        userinfo = userinfo or None
    port: Optional[int] = None
    if ":" in authority:
        hostpart, portpart = authority.rsplit(":", 1)
        if portpart:
            if not portpart.isdigit():
                return None
            port = int(portpart)
            if port > 65535:
                return None
        authority = hostpart
    host = authority.lower()
    if not host or any(
        c in host for c in ' #/?@\\[]<>^|{}"'
    ) or any(ord(c) <= 0x1F for c in host):
        return None
    if port == _SPECIAL_PORTS[scheme]:
        port = None
    path = _resolve_dot_segments(path) if path else ""
    if not path.startswith("/"):
        path = "/" + path
    path = _pct_encode(path, _PATH_ENCODE)
    if query is not None:
        query = _pct_encode(query, _QUERY_ENCODE)
    if frag is not None:
        frag = _pct_encode(frag, _FRAGMENT_ENCODE)
    return ParsedUrl(scheme, host, port, path, query, frag, userinfo)


def rust_url_join(base: ParsedUrl, href: str, strip_fragment: bool = False) -> Optional[str]:
    """``base.join(href)`` per WHATWG; returns the serialized absolute URL or
    None when the join fails. ``strip_fragment`` applies ``set_fragment(None)``
    (F3, src/supercrawler.rs:748)."""
    href = href.strip()
    href = href.replace("\t", "").replace("\n", "").replace("\r", "")
    absolute = rust_url_parse(href)
    if absolute is None and ":" in href.split("/")[0].split("?")[0].split("#")[0]:
        # has a scheme but failed to parse as special → reference's join errors
        # for unparsable, but non-special absolute schemes (ftp handled above)
        # like data: are join-valid in WHATWG; the crawl prefilter removes the
        # common ones (javascript:, mailto:) before this point. Treat the rest
        # as unjoinable (dropped with a warn in the reference).
        return None
    if absolute is not None:
        result = absolute
    elif href.startswith("//"):
        result = rust_url_parse(f"{base.scheme}:{href}")
        if result is None:
            return None
    else:
        frag: Optional[str] = None
        fi = href.find("#")
        if fi != -1:
            frag = href[fi + 1:]
            href = href[:fi]
        query = base.query
        qi = href.find("?")
        if qi != -1:
            query = href[qi + 1:]
            href = href[:qi]
        elif href:
            query = None
        if not href:
            path = base.path
        elif href.startswith("/"):
            path = _resolve_dot_segments(href)
        else:
            merge_base = base.path[: base.path.rfind("/") + 1] or "/"
            path = _resolve_dot_segments(merge_base + href)
        if not path.startswith("/"):
            path = "/" + path
        result = ParsedUrl(
            base.scheme, base.host, base.port,
            _pct_encode(path, _PATH_ENCODE),
            _pct_encode(query, _QUERY_ENCODE) if query is not None else None,
            _pct_encode(frag, _FRAGMENT_ENCODE) if frag is not None else None,
            base.userinfo,
        )
    if strip_fragment:
        result = replace(result, fragment=None)
    return result.to_string()


_TRACKING_PREFIXES = ("utm_",)
_TRACKING_PARAMS = {"gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "ref_src"}


def strip_tracking_params(query: Optional[str]) -> Optional[str]:
    if query is None:
        return None
    kept = []
    for pair in query.split("&"):
        key = pair.split("=", 1)[0].lower()
        if key.startswith(_TRACKING_PREFIXES) or key in _TRACKING_PARAMS:
            continue
        kept.append(pair)
    return "&".join(kept) if kept else None


def canonicalize_url(url: str, strip_tracking: bool = True) -> Optional[str]:
    """RFC-3986/WHATWG normalize + drop fragment (+ tracking params).

    With ``strip_tracking=False`` this is byte-identical to the reference's
    implicit ``Url::parse(s)?.to_string()`` + ``set_fragment(None)``.
    """
    parsed = rust_url_parse(url)
    if parsed is None:
        return None
    parsed = replace(parsed, fragment=None)
    if strip_tracking:
        parsed = replace(parsed, query=strip_tracking_params(parsed.query))
    return parsed.to_string()


def url_host(url: str) -> Optional[str]:
    parsed = rust_url_parse(url)
    return parsed.host if parsed is not None else None
