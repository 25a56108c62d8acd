"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet tables
(sf0.001 for speed; the driver uses sf0.01), compare row count + schema
(column names) + order-insensitive values."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

import os

# default sf0.001 for speed; the driver gate runs sf0.01 — override with
# SPARK_GRAFT_PARITY_DIR=/root/testdata/sf0.01 to pre-verify at gate scale
SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _compare(name, spark_df, duck_df):
    s = _normalize(spark_df.toPandas())
    d = _normalize(duck_df)
    assert list(s.columns) == list(d.columns), \
        f"{name}: columns {list(s.columns)} != {list(d.columns)}"
    assert len(s) == len(d), f"{name}: rows {len(s)} != {len(d)}"
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if isinstance(a, float) or isinstance(b, float):
                af, bf = float(a), float(b)
                if math.isnan(af) and math.isnan(bf):
                    continue
                assert abs(af - bf) <= 1e-9, f"{name}.{c}[{i}]: {a} != {b}"
            else:
                assert str(a) == str(b), f"{name}.{c}[{i}]: {a!r} != {b!r}"


FAST_QUERIES = [q for q in entry_mod.queries() if q != "crawl_seen"]


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    assert sql is not None, f"{name} has no oracle"
    spark_df = q(spark, SF_DIR)
    duck_df = duck.execute(sql).df()
    _compare(name, spark_df, duck_df)


def test_crawl_seen_matches_recursive_cte_oracle(spark, duck):
    """The flagship: full crawl engine ≡ 12-line recursive-SQL BFS spec."""
    spark_df = entry_mod.q_crawl_seen(spark, SF_DIR)
    duck_df = duck.execute(entry_mod.oracle_sql()["crawl_seen"]).df()
    _compare("crawl_seen", spark_df, duck_df)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["url", "depth", "seq", "mdx_len", "doc_key"]
