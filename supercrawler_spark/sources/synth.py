"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-4).

Generates the ``pages(url, warc_ts, html, text, lang)`` table (BASELINE.json
``input_hint``), a ``seeds`` table, and a ``robots`` table — all seeded
(seed=42), pure-Python, no external data. The embedded link graph follows
FIXTURES.md §3: ~70% same-host edges, ~15% cross-host in-scope, ~15%
off-scope, per-page noise links (fragment/javascript:/mailto:), dangling
targets ≙ fetch failures, and a hot host owning ~40% of pages/in-links so
skew handling is actually exercised.

The ``text`` column is the golden MDX (engine output must be byte-identical);
it is produced by the executable spec (refspec.clean_to_mdx), whose own
fidelity to the reference is pinned by the hand-audited unit fixtures in
tests/test_refspec.py.

Layout: parquet dir partitioned by ``bucket=pmod(xxhash64(url), B)`` — the
same expression the engine computes JVM-side (functions/udfs.bucket_col), so
seen/frontier co-bucketing is consistent end-to-end. Iceberg would provide
the same layout via ``bucket(B, url)`` partition transform; no Iceberg
runtime jar ships with this sandbox's PySpark, so the parquet+manifest
fallback is used (SURVEY.md §7.0) and documented in BENCH/BASELINE.md.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from supercrawler_spark import refspec
from supercrawler_spark.functions.hashing import url_bucket

HOT_HOST = "hot.example.com"
SCOPE_HOSTS = [HOT_HOST, "alpha.example.com", "beta.example.com",
               "gamma.example.com", "delta.example.com"]
OFF_HOSTS = ["offsite.example.net", "external.example.org"]

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _det(seed: int, *parts) -> int:
    """Deterministic 64-bit value from (seed, parts) — never Python hash()."""
    payload = ("|".join(str(p) for p in parts) + f"|{seed}").encode()
    return int.from_bytes(hashlib.md5(payload).digest()[:8], "big")


@dataclass
class SynthPage:
    gid: int
    host: str
    path: str
    url: str
    links: list[str] = field(default_factory=list)
    html: str = ""          # raw body (HTML markup or fake-PDF bytes as str)
    text: str = ""
    lang: str = "en"
    content_type: str = "text/html; charset=utf-8"


def _assign_host(seed: int, gid: int) -> str:
    r = _det(seed, "host", gid) % 100
    if r < 40:
        return HOT_HOST  # hot-host skew: ~40% of pages
    return SCOPE_HOSTS[1 + (r % (len(SCOPE_HOSTS) - 1))]


def _content_kind(seed: int, gid: int) -> str:
    """~4% PDF pages (F5/S3/X8 dispatch), ~1% unsupported content type
    (reference skips those with a log, src/supercrawler.rs:767-770)."""
    r = _det(seed, "ctype", gid) % 100
    if r < 4:
        return "pdf"
    if r < 5:
        return "other"
    return "html"


def _page_path(seed: int, gid: int) -> str:
    if _content_kind(seed, gid) == "pdf":
        return f"/files/f{gid}.pdf"
    # every 20th page sits under a robots-disallowed prefix
    if _det(seed, "priv", gid) % 20 == 0:
        return f"/private/p{gid}"
    if _det(seed, "deep", gid) % 5 == 0:
        return f"/docs/s{gid % 7}/p{gid}"
    return f"/p{gid}"


def _gen_link_hrefs(seed: int, page: SynthPage, n_pages: int,
                    url_of: dict[int, str], host_of: dict[int, str]) -> list[str]:
    """Raw hrefs to embed, document order. Mix of relative/absolute forms,
    tracking-param and fragment variants, off-scope and dangling targets."""
    k = _det(seed, "fanout", page.gid) % 9  # Uniform[0,8]
    hrefs: list[str] = []
    for j in range(k):
        r = _det(seed, "edge", page.gid, j) % 100
        if r < 70:  # same-host
            tgt = [g for g in _pick_targets(seed, page.gid, j, n_pages, 4)
                   if host_of[g] == page.host]
            if not tgt:
                continue
            t = tgt[0]
            # path-relative / absolute-path / full-url variants
            form = _det(seed, "form", page.gid, j) % 4
            target_path = url_of[t].split(page.host, 1)[1]
            if form == 0:
                hrefs.append(target_path)                      # absolute path
            elif form == 1:
                hrefs.append(f"https://{page.host}{target_path}")
            elif form == 2:
                hrefs.append(f"{target_path}?utm_source=feed&utm_medium=syn")
            else:
                hrefs.append(f"{target_path}#section-{j}")
        elif r < 85:  # cross-host, in-scope
            t = _pick_targets(seed, page.gid, j, n_pages, 1)[0]
            hrefs.append(url_of[t])
        else:  # off-scope
            off = OFF_HOSTS[_det(seed, "off", page.gid, j) % len(OFF_HOSTS)]
            hrefs.append(f"https://{off}/x{_det(seed, 'offp', page.gid, j) % 1000}")
    # ~5% dangling in-scope target (in pages-table's host space but absent)
    if _det(seed, "dangle", page.gid) % 20 == 0:
        hrefs.append(f"https://{page.host}/missing/m{page.gid}")
    # per-page noise links (prefiltered by F1)
    hrefs.extend([f"#frag{page.gid % 3}", "javascript:void(0)", "mailto:spam@example.com"])
    return hrefs


def _pick_targets(seed: int, gid: int, j: int, n_pages: int, tries: int) -> list[int]:
    return [_det(seed, "tgt", gid, j, t) % n_pages for t in range(tries)]


_CODE_SNIPPETS = [
    ("language-python", "def f(x):\n    return x + 1"),
    ("lang-rust", "fn main() { println!(\"hi\"); }"),
    ("highlight-jsx", "const App = () => <div/>;"),
    ("", "import React from 'react';\nexport default 1;"),
    ("shell", "echo hello | wc -l"),
]

_WORDS = ("crawl frontier spark shuffle partition bloom filter robots politeness "
          "extract markdown parquet iceberg lineage checkpoint skew salt bucket "
          "broadcast semi join anti dedup canonical url host depth round metric").split()


def _sentence(seed: int, gid: int, tag: str, n: int) -> str:
    return " ".join(_WORDS[_det(seed, tag, gid, i) % len(_WORDS)] for i in range(n))


def _build_html(seed: int, page: SynthPage, hrefs: list[str]) -> str:
    g = page.gid
    v = _det(seed, "variant", g) % 8
    parts = ["<html><head>"]
    if v != 3:  # variant 3: no title → "Untitled"
        parts.append(f"<title>Page {g} on {page.host}</title>")
    if v not in (3, 4):  # variants 3,4: no meta description → first-<p> fallback
        parts.append(f'<meta name="description" content="Synthetic page {g} about '
                     f'{_sentence(seed, g, "desc", 4)}">')
    if v == 1:
        parts.append(f'<meta name="keywords" content="k{g},crawl,{page.host}">')
        parts.append('<meta name="author" content="Synth Author">')
        parts.append('<meta property="article:published_time" content="2025-01-02T03:04:05Z">')
    if v == 2:
        parts.append(f'<link rel="canonical" href="https://{page.host}/canonical/p{g}">')
    parts.append("</head><body>")
    parts.append(f"<h1>Page {g}</h1>")
    parts.append(f"<p>{_sentence(seed, g, 'lead', 24)}.</p>")

    # realistic page weight: several content sections per page (heavier
    # extraction per row → compute-dominated benches that actually scale)
    for sec in range(3 + _det(seed, "nsec", g) % 3):
        parts.append(f"<h2>Topic {sec}</h2>")
        parts.append(f"<p>{_sentence(seed, g, f'body{sec}', 40)} "
                     f"<strong>{_sentence(seed, g, f'bs{sec}', 3)}</strong> "
                     f"{_sentence(seed, g, f'bt{sec}', 30)}.</p>")
        if sec % 2 == 0:
            parts.append("<ul>" + "".join(
                f"<li>{_sentence(seed, g, f'li{sec}-{i}', 6)}</li>" for i in range(4))
                + "</ul>")

    # interleave content blocks with anchor links (document order = hrefs order)
    for idx, href in enumerate(hrefs):
        if v == 0 and idx == 1:
            parts.append(f"<h2>Section {idx}</h2><p>{_sentence(seed, g, f's{idx}', 12)} "
                         f"with <strong>bold</strong> and <em>em</em>.</p>")
        if v == 1 and idx == 1:
            parts.append("<ul><li>alpha item</li><li>beta <code>inline()</code></li><li></li></ul>")
        if v == 2 and idx == 1:
            cls, code = _CODE_SNIPPETS[_det(seed, "code", g) % len(_CODE_SNIPPETS)]
            cls_attr = f' class="{cls}"' if cls else ""
            parts.append(f"<pre><code{cls_attr}>{code}</code></pre>")
        if v == 4 and idx == 1:
            parts.append("<table><thead><tr><th>K</th><th>V</th></tr></thead>"
                         f"<tbody><tr><td>gid</td><td>{g}</td></tr>"
                         f"<tr><td>host</td><td>{page.host}</td></tr></tbody></table>")
        if v == 5 and idx == 1:
            parts.append(f"<blockquote><p>{_sentence(seed, g, 'q', 8)}</p></blockquote>")
        if v == 6 and idx == 1:
            parts.append(f'<img src="/img/{g}.png" alt="figure {g}"><img src="" alt="skipped">')
        parts.append(f'<p>See <a href="{href}">link {idx}</a> for more.</p>')
    if v == 7:
        # >3 headings → ToC marker branch
        parts.extend(f"<h2>H{i}</h2><p>{_sentence(seed, g, f'h{i}', 10)}.</p>" for i in range(4))
    parts.append(f"<div>{_sentence(seed, g, 'loose', 6)} loose tail text</div>")
    parts.append('<nav><a href="/nav-ignored">nav link</a></nav>')
    if v == 5:
        parts.append(f'<div class="related"><a href="/p{(g * 7) % 997}">Related {g}</a></div>')
    parts.append("</body></html>")
    return "".join(parts)


_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]


@dataclass
class Corpus:
    pages: list[SynthPage]
    seeds: list[str]          # seed urls, request order
    robots: list[dict]
    seed: int
    n_pages: int

    def url_map(self) -> dict[str, SynthPage]:
        return {p.url: p for p in self.pages}


GENERATOR_VERSION = 3  # bump when page templates change (invalidates caches)


def _build_pages_chunk(args) -> list:
    seed, gids, n, host_items, path_items, with_goldens = args
    host_of = dict(host_items)
    path_of = dict(path_items)
    url_of = {g: f"https://{host_of[g]}{path_of[g]}" for g in host_of}
    out = []
    for g in gids:
        page = SynthPage(gid=g, host=host_of[g], path=path_of[g], url=url_of[g],
                         lang=_LANGS[_det(seed, "lang", g) % len(_LANGS)])
        kind = _content_kind(seed, g)
        if kind == "pdf":
            body = _sentence(seed, g, "pdfbody", 60)
            page.html = f"%PDF-1.4\nBT\n{body}\nET\n%%EOF"
            page.content_type = "application/pdf"
            if with_goldens:
                page.text = refspec.pdf_to_mdx(page.url, body)
        elif kind == "other":
            page.html = f"BINARYPAYLOAD:{g}:" + _sentence(seed, g, "bin", 10)
            page.content_type = "application/octet-stream"
            page.text = ""   # reference skips unsupported types (rs:767-770)
        else:
            hrefs = _gen_link_hrefs(seed, page, n, url_of, host_of)
            page.html = _build_html(seed, page, hrefs)
            if with_goldens:
                page.text = refspec.clean_to_mdx(page.html, page.url)
        out.append(page)
    return out


def generate_corpus(sf: float, seed: int = 42, with_goldens: bool = True,
                    workers: int | None = None) -> Corpus:
    n = max(10, int(round(500 * sf / 0.001)))
    host_of = {g: _assign_host(seed, g) for g in range(n)}
    path_of = {g: _page_path(seed, g) for g in range(n)}
    url_of = {g: f"https://{host_of[g]}{path_of[g]}" for g in range(n)}

    host_items = list(host_of.items())
    path_items = list(path_of.items())
    if workers is None:
        workers = min(os.cpu_count() or 4, 32) if n > 2000 else 1
    if workers > 1:
        from concurrent.futures import ProcessPoolExecutor
        chunk = (n + workers - 1) // workers
        jobs = [(seed, list(range(lo, min(lo + chunk, n))), n,
                 host_items, path_items, with_goldens)
                for lo in range(0, n, chunk)]
        pages = []
        with ProcessPoolExecutor(max_workers=workers) as pool:
            for part in pool.map(_build_pages_chunk, jobs):
                pages.extend(part)
        pages.sort(key=lambda p: p.gid)
    else:
        pages = _build_pages_chunk(
            (seed, list(range(n)), n, host_items, path_items, with_goldens))

    n_seeds = 3 if n <= 1000 else 10
    # seeds spread across scope hosts, request order fixed by rank
    seeds: list[str] = []
    per_host: dict[str, list[int]] = {}
    for g in range(n):
        per_host.setdefault(host_of[g], []).append(g)
    hosts_cycle = SCOPE_HOSTS[:3] if n_seeds == 3 else SCOPE_HOSTS
    i = 0
    while len(seeds) < n_seeds:
        h = hosts_cycle[len(seeds) % len(hosts_cycle)]
        cands = per_host.get(h, [])
        if cands:
            seeds.append(url_of[cands[_det(seed, "seedpick", len(seeds)) % len(cands)]])
        i += 1
        if i > 10 * n_seeds:
            break
    # guarantee the PDF dispatch path is exercised: one PDF page as an
    # extra seed (its host is already in scope or becomes so)
    pdf_gids = [g for g in range(n) if _content_kind(seed, g) == "pdf"]
    if pdf_gids:
        seeds.append(url_of[pdf_gids[_det(seed, "pdfseed") % len(pdf_gids)]])

    robots = [
        {"host": h,
         "disallow_prefixes": ["/private"],
         "crawl_delay_ms": 500 if h == HOT_HOST else 0}
        for h in SCOPE_HOSTS
    ]
    return Corpus(pages=pages, seeds=seeds, robots=robots, seed=seed, n_pages=n)


# ---------------------------------------------------------------------------
# Parquet materialization (bucketed layout + manifest)
# ---------------------------------------------------------------------------


def write_corpus(corpus: Corpus, out_dir: str, num_buckets: int = 32) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pages_dir = os.path.join(out_dir, "pages")
    rows_by_bucket: dict[int, dict[str, list]] = {}
    for p in corpus.pages:
        b = url_bucket(p.url, num_buckets)
        cols = rows_by_bucket.setdefault(
            b, {"url": [], "warc_ts": [], "html": [], "text": [],
                "lang": [], "content_type": []})
        cols["url"].append(p.url)
        cols["warc_ts"].append(_EPOCH + timedelta(seconds=p.gid))
        cols["html"].append(p.html.encode("utf-8"))
        cols["text"].append(p.text)
        cols["lang"].append(p.lang)
        cols["content_type"].append(p.content_type)
    schema = pa.schema([
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content_type", pa.string()),
    ])
    for b, cols in sorted(rows_by_bucket.items()):
        bdir = os.path.join(pages_dir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        pq.write_table(pa.table(cols, schema=schema),
                       os.path.join(bdir, "part-0.parquet"),
                       compression="zstd")

    seeds_tbl = pa.table({
        "url": corpus.seeds,
        "seed_order": list(range(len(corpus.seeds))),
    })
    pq.write_table(seeds_tbl, os.path.join(out_dir, "seeds.parquet"))
    robots_tbl = pa.table({
        "host": [r["host"] for r in corpus.robots],
        "disallow_prefixes": [r["disallow_prefixes"] for r in corpus.robots],
        "crawl_delay_ms": [r["crawl_delay_ms"] for r in corpus.robots],
    })
    pq.write_table(robots_tbl, os.path.join(out_dir, "robots.parquet"))

    manifest = {
        "seed": corpus.seed,
        "n_pages": corpus.n_pages,
        "num_buckets": num_buckets,
        "bucket_expr": "pmod(xxhash64(url), num_buckets)",
        "tables": {"pages": "pages/", "seeds": "seeds.parquet",
                   "robots": "robots.parquet"},
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def ensure_corpus(sf: float, seed: int = 42, cache_root: str | None = None,
                  num_buckets: int = 32) -> str:
    """Generate-once cache; returns the corpus directory."""
    cache_root = cache_root or os.environ.get(
        "SPARK_GRAFT_SYNTH_CACHE", "/tmp/supercrawler_synth")
    out_dir = os.path.join(
        cache_root, f"v{GENERATOR_VERSION}_sf{sf}_seed{seed}_b{num_buckets}")
    manifest_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(manifest_path):
        return out_dir
    corpus = generate_corpus(sf, seed)
    write_corpus(corpus, out_dir, num_buckets)
    return out_dir


def load_tables(spark, corpus_dir: str):
    """(pages, seeds, robots) DataFrames from a materialized corpus dir."""
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages"))
    seeds = spark.read.parquet(os.path.join(corpus_dir, "seeds.parquet"))
    robots = spark.read.parquet(os.path.join(corpus_dir, "robots.parquet"))
    return pages, seeds, robots
