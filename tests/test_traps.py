"""trap_signals: hand-built URL shapes — a calendar/session-query host, a
cyclic-path host, a clean host, and a host below min_urls that trips a ratio
but must stay unflagged."""

from supercrawler_spark.operators.traps import trap_signals


def test_trap_signals_flags_query_and_cycle_hosts(spark):
    urls = (
        # trap.example.com: 10 urls, all with session query -> query_ratio 1
        [(f"https://trap.example.com/cal/2024/{i}/index?session={i}",)
         for i in range(10)]
        # cycle.example.com: 10 urls, half /a/b/a/b cycles -> repeat 0.5
        + [(f"https://cycle.example.com/a/b/a/b/{i}",) for i in range(5)]
        + [(f"https://cycle.example.com/page/{i}",) for i in range(5)]
        # clean.example.com: 12 shallow unique paths
        + [(f"https://clean.example.com/doc/{i}",) for i in range(12)]
        # small.example.com: 100% queries but only 3 urls (< min_urls)
        + [(f"https://small.example.com/x?q={i}",) for i in range(3)]
        # uppercase scheme/host still parses and folds into clean host
        + [("HTTPS://CLEAN.example.com/doc/up",)]
        # '?' inside the fragment is NOT a query string
        + [("https://clean.example.com/doc/frag#sec?x=1",)]
        # unparseable strays are excluded, not pooled into host ''
        + [("/relative/path?x=1",), ("//scheme-relative.com/a?b=1",)])
    out = {r["host"]: r for r in
           trap_signals(spark.createDataFrame(urls, "url string")).collect()}
    assert "" not in out
    assert out["clean.example.com"]["n_urls"] == 14
    assert out["clean.example.com"]["query_ratio"] == 0.0

    assert out["trap.example.com"]["suspect"] == 1
    assert out["trap.example.com"]["query_ratio"] == 1.0
    assert out["trap.example.com"]["max_depth"] == 4       # cal/2024/i/index

    assert out["cycle.example.com"]["suspect"] == 1
    assert out["cycle.example.com"]["repeat_ratio"] == 0.5

    assert out["clean.example.com"]["suspect"] == 0
    assert out["clean.example.com"]["avg_depth"] == 2.0

    assert out["small.example.com"]["suspect"] == 0        # below min_urls
