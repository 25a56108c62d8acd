"""robots.txt parsing — closes the loop on the north-rule politeness story:
the ``robots`` table the crawl engine enforces (host, disallow_prefixes,
crawl_delay_ms) is derived from the /robots.txt pages already present in the
Common-Crawl-style pages table, instead of arriving out-of-band.

The reference has no robots support at all (politeness is a north-rule
extension); the parser grammar is the original robots.txt de-facto standard
(Koster) as codified by RFC 9309: ``User-agent`` groups, ``Disallow``/
``Allow`` rules including the §2.2.3 special characters (``*`` any-run and
trailing ``$`` end anchor, translated to portable regexes at parse time so
the per-URL match stays a JVM fold), the de-facto ``Crawl-delay``
extension, ``#`` comments, blank-line group separation, case-insensitive
field names, most-specific-agent-wins (exact agent name beats ``*``).
Precedence is longest-RULE-wins with Allow beating Disallow on ties, for
plain and wildcard rules uniformly.

The parse runs as an Arrow-vectorized pandas UDF (one robots body per row,
host-count rows total — robots bodies are tiny and per-host, so this is a
droplet next to the page extraction kernel)."""

from __future__ import annotations

import re as _re

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

# Plain rules stay string prefixes (the fast path: a startswith fold).
# RFC 9309 §2.2.3 special characters — ``*`` (any char run) and a trailing
# ``$`` (end anchor) — ride as pre-translated regexes plus the ORIGINAL
# rule octet length, because precedence is decided by the raw rule length
# for both kinds (longest rule wins, Allow beats Disallow on ties).
ROBOTS_STRUCT = StructType([
    StructField("disallow_prefixes", ArrayType(StringType())),
    StructField("allow_prefixes", ArrayType(StringType())),
    StructField("crawl_delay_ms", LongType()),
    StructField("disallow_wild_rx", ArrayType(StringType())),
    StructField("disallow_wild_len", ArrayType(LongType())),
    StructField("allow_wild_rx", ArrayType(StringType())),
    StructField("allow_wild_len", ArrayType(LongType())),
])

WILD_COLS = ["disallow_wild_rx", "disallow_wild_len",
             "allow_wild_rx", "allow_wild_len"]

_RX_SPECIALS = set(".^$*+?()[]{}|\\")


def is_wildcard_rule(rule: str) -> bool:
    return "*" in rule or rule.endswith("$")


def glob_to_regex(rule: str) -> str:
    """RFC 9309 rule -> anchored regex for java.util.regex / RE2 (only
    ``\\<punct>`` escapes, ``.*``, and a final ``\\z``; ``(?s)`` so a stray
    newline in a path cannot break the ``*`` run).

    The end anchor is ``\\z`` (absolute end of input), NOT ``$``: in both
    Java and Python, ``$`` also matches just before a trailing newline, so
    a path ending in ``\\n`` (e.g. ``/x.php\\n``) would wrongly satisfy
    ``/*.php$``. Python ``re`` (< 3.14) spells absolute-end ``\\Z``;
    :func:`rule_match_len` rewrites the suffix for the Python flavor."""
    anchored = rule.endswith("$")
    core = rule[:-1] if anchored else rule
    esc = lambda seg: "".join("\\" + c if c in _RX_SPECIALS else c
                              for c in seg)
    body = ".*".join(esc(seg) for seg in core.split("*"))
    return "(?s)^" + body + ("\\z" if anchored else "")


def rule_match_len(path: str, rule: str) -> int:
    """Octet length of ``rule`` if it matches ``path``, else -1 — the
    pure-Python spec the JVM folds must agree with."""
    if not is_wildcard_rule(rule):
        return len(rule) if path.startswith(rule) else -1
    rx = glob_to_regex(rule)
    if rx.endswith("\\z"):  # Python re spells absolute-end \Z, Java \z
        rx = rx[:-2] + "\\Z"
    return len(rule) if _re.match(rx, path) else -1


def parse_robots_txt(body: str, user_agent: str = "*"):
    """(disallow_prefixes, allow_prefixes, crawl_delay_ms) for
    ``user_agent``.

    Groups are runs of User-agent lines followed by rules; a group applies to
    the agent if any of its User-agent values is ``*`` or a case-insensitive
    match of ``user_agent``. The most specific applicable group wins (exact
    match beats ``*``); among equally specific groups the rules merge in file
    order. Empty ``Disallow:`` means allow-all (contributes no prefix);
    ``Allow:`` prefixes override Disallow by RFC 9309 longest-match (the
    precedence itself is applied at check time — ``is_blocked`` here and the
    engine's politeness predicate). ``crawl_delay_ms`` is 0 when absent or
    unparsable (seconds, fractional allowed)."""
    exact: list[tuple[list[str], list[str], float | None]] = []
    wild: list[tuple[list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_alw: list[str] = []
    cur_delay: float | None = None
    in_rules = False
    ua = user_agent.lower()

    def _flush():
        nonlocal cur_agents, cur_dis, cur_alw, cur_delay
        if cur_agents:
            rec = (cur_dis, cur_alw, cur_delay)
            agents = [a.lower() for a in cur_agents]
            if ua != "*" and any(a == ua for a in agents):
                exact.append(rec)
            elif "*" in agents or (ua == "*" and any(a == ua for a in agents)):
                wild.append(rec)
        cur_agents, cur_dis, cur_alw, cur_delay = [], [], [], None

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:            # new group starts
                _flush()
                in_rules = False
            cur_agents.append(value)
        elif field in ("disallow", "crawl-delay", "allow"):
            in_rules = True
            if field == "disallow" and value:
                cur_dis.append(value)
            elif field == "allow" and value:
                cur_alw.append(value)
            elif field == "crawl-delay":
                try:
                    cur_delay = float(value)
                except ValueError:
                    pass
    _flush()

    groups = exact if exact else wild
    prefixes: list[str] = []
    allows: list[str] = []
    delay: float | None = None
    for dis, alw, dl in groups:
        prefixes.extend(dis)
        allows.extend(alw)
        if dl is not None and (delay is None or dl > delay):
            delay = dl          # conservative: the largest applicable delay
    return prefixes, allows, int(round((delay or 0.0) * 1000))


def is_blocked(path: str, disallow: list, allow: list) -> bool:
    """RFC 9309 precedence: the longest matching rule wins; an Allow match
    of equal length beats Disallow. Rules may carry ``*``/``$`` wildcards.
    Pure-Python twin of the engine's JVM predicate (crawler politeness
    join) for the oracle/tests."""
    d = max((rule_match_len(path, p) for p in disallow or []), default=-1)
    a = max((rule_match_len(path, p) for p in allow or []), default=-1)
    return d > max(a, 0)


def _split_wild(rules: list) -> tuple[list, list, list]:
    """(plain_prefixes, wild_regexes, wild_rule_lens) for one rule list."""
    plain = [r for r in rules if not is_wildcard_rule(r)]
    wild = [r for r in rules if is_wildcard_rule(r)]
    return plain, [glob_to_regex(r) for r in wild], [len(r) for r in wild]


def make_parse_robots(user_agent: str = "*"):
    @pandas_udf(ROBOTS_STRUCT)
    def parse_robots_udf(body: pd.Series) -> pd.DataFrame:
        cols: dict = {f.name: [] for f in ROBOTS_STRUCT.fields}
        for b in body:
            if b is None:
                d, a, ms = [], [], 0
            else:
                if isinstance(b, (bytes, bytearray)):
                    b = bytes(b).decode("utf-8", errors="replace")
                d, a, ms = parse_robots_txt(b, user_agent)
            dp, dwr, dwl = _split_wild(d)
            ap, awr, awl = _split_wild(a)
            cols["disallow_prefixes"].append(dp)
            cols["allow_prefixes"].append(ap)
            cols["crawl_delay_ms"].append(ms)
            cols["disallow_wild_rx"].append(dwr)
            cols["disallow_wild_len"].append(dwl)
            cols["allow_wild_rx"].append(awr)
            cols["allow_wild_len"].append(awl)
        return pd.DataFrame(cols)
    return parse_robots_udf


def best_match_len(path: Column, prefixes: Column,
                   wild_rx: Column | None = None,
                   wild_len: Column | None = None) -> Column:
    """JVM fold: the longest rule length matching ``path`` (0 when none) —
    plain prefixes via startswith, wildcard rules via their pre-translated
    per-row regexes (``regexp_like`` with a column pattern). Equal to
    ``max(rule_match_len(path, r) for r in rules)`` by the equivalence
    test; runs inside whole-stage codegen, no UDF.

    Cost note: a column pattern is non-foldable, so Spark compiles each
    wildcard regex per (url x rule) evaluation instead of caching one
    Pattern. Wildcard rules are rare (most robots files are plain
    prefixes, which take the startswith arm), so this is fine at crawl
    scale; if a wildcard-heavy host ever dominates a profile, pre-join
    the distinct (host, rule) match table or cap wildcard rules per host
    before this fold."""
    empty_s = F.array().cast("array<string>")
    best = F.aggregate(
        F.coalesce(prefixes, empty_s), F.lit(0).cast("long"),
        lambda acc, p: F.when(path.startswith(p)
                              & (F.length(p) > acc),
                              F.length(p).cast("long")).otherwise(acc))
    if wild_rx is None:
        return best
    pairs = F.zip_with(F.coalesce(wild_rx, empty_s),
                       F.coalesce(wild_len, F.array().cast("array<long>")),
                       lambda r, l: F.struct(r.alias("rx"), l.alias("rl")))
    return F.aggregate(
        pairs, best,
        lambda acc, x: F.when(
            F.call_function("regexp_like", path, x["rx"])
            & (x["rl"] > acc), x["rl"]).otherwise(acc))


def robots_from_pages(pages: DataFrame, user_agent: str = "*") -> DataFrame:
    """Derive the crawl engine's robots table from the /robots.txt rows of a
    Common-Crawl-style pages table: (host, disallow_prefixes,
    crawl_delay_ms). The filter pushes to the parquet scan (url suffix
    predicate; with multiple warc_ts snapshots the latest body wins), and the
    per-host result is small enough to broadcast into the politeness join.

    Exactly ONE row per host: a host whose robots.txt appears under several
    URLs (http+https schemes, multiple warc_ts snapshots) resolves to the
    latest warc_ts, ties broken by max url — without this the politeness
    left join on host would fan out every frontier row of that host,
    duplicating fetches, docs and seq values."""
    rob = (pages.filter(F.col("url").endswith("/robots.txt"))
           .withColumn("host",
                       F.regexp_extract("url", r"^https?://([^/]+)/", 1)))
    order = (F.struct(F.col("warc_ts"), F.col("url"))
             if "warc_ts" in pages.columns else F.col("url"))
    rob = rob.groupBy("host").agg(F.max_by(F.col("html"), order).alias("html"))
    parse = make_parse_robots(user_agent)
    return (rob
            .withColumn("r", parse(F.col("html")))
            .select("host",
                    F.col("r.disallow_prefixes").alias("disallow_prefixes"),
                    F.col("r.allow_prefixes").alias("allow_prefixes"),
                    F.col("r.crawl_delay_ms").alias("crawl_delay_ms"),
                    *[F.col(f"r.{c}").alias(c) for c in WILD_COLS]))


def robots_refresh(robots_meta: DataFrame, now_ts, max_age_hours: int = 24,
                   host_col: str = "host",
                   ts_col: str = "fetched_ts") -> DataFrame:
    """(host, age_hours): hosts whose cached robots.txt has exceeded the
    cache lifetime and must be refetched before the next crawl round —
    RFC 9309 §2.4 allows caching "generally up to 24 hours", so a polite
    crawler re-validates on that clock. Pure column arithmetic over the
    narrow per-host robots metadata table (one row per host by
    construction, see robots_from_pages)."""
    now = F.lit(now_ts).cast("timestamp")
    age_h = F.floor((F.unix_timestamp(now)
                     - F.unix_timestamp(F.col(ts_col))) / 3600).cast("long")
    return (robots_meta.select(F.col(host_col).alias("host"),
                               age_h.alias("age_hours"))
            .filter(F.col("age_hours") >= max_age_hours))
