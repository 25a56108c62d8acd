"""Pure-Python oracle BFS — ground truth for crawl semantics tests.

Mirrors the reference scheduler loop (src/supercrawler.rs:1259-1369) at
concurrency 1, which by SURVEY.md §7.0 is the reproducible ordering contract:
depth-major, seed order, parent order, in-document link position. The Spark
engine must produce identical per-round frontiers (order included), final
URL-seen set, docs set, and metric counts.

No Spark imports — this module must stay cheap to run in-process.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from supercrawler_spark import refspec
from supercrawler_spark.functions.urls import canonicalize_url, url_host


@dataclass
class OracleResult:
    frontier_by_depth: dict[int, list[str]] = field(default_factory=dict)
    seen: set = field(default_factory=set)
    docs: list = field(default_factory=list)        # (url, depth, mdx) in crawl order
    processed_count: int = 0
    metrics_by_depth: dict[int, dict] = field(default_factory=dict)

    def doc_urls(self) -> list[str]:
        return [u for u, _, _ in self.docs]


def oracle_bfs(
    pages: dict,
    seed_urls: list[str],
    crawl_depth: int = 2,
    strip_tracking: bool = True,
    robots: list[dict] | None = None,
    variant: str = "supercrawler",
) -> OracleResult:
    """BFS over ``pages`` (canonical url → body string, or
    (body, content_type) tuple for the F5 content-type dispatch).

    ``robots`` (north-rule extension; None ≙ reference parity) is a list of
    {host, disallow_prefixes, crawl_delay_ms}; blocked URLs are counted,
    marked seen, and never fetched.
    """
    res = OracleResult()
    disallow: dict[str, list[str]] = {}
    allow: dict[str, list[str]] = {}
    if robots:
        for r in robots:
            disallow[r["host"]] = list(r.get("disallow_prefixes") or [])
            allow[r["host"]] = list(r.get("allow_prefixes") or [])

    # J2: scope = seed hosts (src/supercrawler.rs:1236-1239)
    scope = set()
    for u in seed_urls:
        h = url_host(u)
        if h is not None:
            scope.add(h)

    queue: deque[tuple[str, int]] = deque()
    # seed enqueue (rs:1241-1252): canonicalize, first-seen dedup, depth 0
    for u in seed_urls:
        c = canonicalize_url(u, strip_tracking=strip_tracking)
        if c is None:
            continue
        if c not in res.seen:
            res.seen.add(c)
            queue.append((c, 0))
            res.frontier_by_depth.setdefault(0, []).append(c)

    def _robots_blocked(url: str) -> bool:
        # RFC 9309 longest-match precedence (Allow beats Disallow on ties,
        # */$ wildcard rules included) — delegates to the same pure-Python
        # spec the engine's JVM fold is equivalence-tested against
        from supercrawler_spark.operators.robots import is_blocked
        h = url_host(url)
        if h is None or h not in disallow:
            return False
        path = url.split(h, 1)[1]
        return is_blocked(path, disallow[h], allow.get(h, []))

    while queue:
        url, depth = queue.popleft()
        if depth > crawl_depth:     # F9 dequeue-side guard (rs:1284-1289)
            continue
        m = res.metrics_by_depth.setdefault(
            depth, {"fetched": 0, "failed": 0, "deduped": 0,
                    "robots_blocked": 0, "frontier_added": 0})
        if robots and _robots_blocked(url):
            m["robots_blocked"] += 1
            continue
        res.processed_count += 1    # A1 (rs:1291)
        entry = pages.get(url)      # S1: fetch ≙ pages-table lookup
        if entry is None:
            m["failed"] += 1        # F7/E4: missing ≙ failed fetch
            continue
        m["fetched"] += 1
        if isinstance(entry, tuple):
            html, content_type = entry
        else:
            html, content_type = entry, "text/html; charset=utf-8"
        # F5 content-type dispatch (rs:717-770)
        if "application/pdf" in content_type:
            try:
                mdx = refspec.pdf_to_mdx(url, refspec.extract_pdf_text(
                    html.encode("latin-1") if isinstance(html, str) else html))
            except Exception:
                mdx = None          # E4: pdf extraction failure isolated
            if mdx and mdx.strip():
                res.docs.append((url, depth, mdx))
            continue                # F6: no link extraction for PDFs
        if "text/html" not in content_type:
            continue                # unsupported type skipped (rs:767-770)
        mdx = refspec.clean_to_mdx(html, url, variant=variant)
        if mdx.strip():             # F12 empty-MDX filter
            res.docs.append((url, depth, mdx))
        if depth < crawl_depth:     # F10 enqueue-side guard (rs:1335)
            for link in refspec.extract_links(html, url):
                c = canonicalize_url(link, strip_tracking=strip_tracking)
                if c is None:
                    continue
                h = url_host(c)
                if h is None or h not in scope:   # F8 exact-host scope
                    continue
                if c in res.seen:                 # J1 seen dedup at enqueue
                    m["deduped"] += 1
                    continue
                res.seen.add(c)
                queue.append((c, depth + 1))
                res.frontier_by_depth.setdefault(depth + 1, []).append(c)
                m["frontier_added"] += 1
    return res
