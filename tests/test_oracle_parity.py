"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet tables
(sf0.001 for speed; the driver uses sf0.01), compare row count + schema
(column names) + order-insensitive values."""

import math

import duckdb
import numpy as np
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


def _dtype_kind(dt) -> str:
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    return "obj"


def _canon(v) -> str:
    """Driver-strict canonical form: int 4 and float 4.0 must NOT collide —
    the driver's value-hash stringifies pandas values, so dtype drift
    (e.g. DuckDB HUGEINT -> float64) flips the hash even when values agree."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return f"bool:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"int:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isinf(f):
            return f"float:{f}"
        return f"float:{round(f, 9)!r}"
    return str(v)


def _compare(name, spark_df, duck_df):
    s = _normalize(spark_df.toPandas() if not isinstance(spark_df, pd.DataFrame)
                   else spark_df)
    d = _normalize(duck_df)
    assert list(s.columns) == list(d.columns), \
        f"{name}: columns {list(s.columns)} != {list(d.columns)}"
    assert len(s) == len(d), f"{name}: rows {len(s)} != {len(d)}"
    for c in s.columns:
        sk, dk = _dtype_kind(s[c].dtype), _dtype_kind(d[c].dtype)
        assert sk == dk, (
            f"{name}.{c}: dtype kind {s[c].dtype} (spark) vs {d[c].dtype} "
            f"(oracle) — int/float drift flips the driver's value-hash; "
            f"CAST the oracle output (e.g. AS BIGINT)")
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            ca, cb = _canon(a), _canon(b)
            assert ca == cb, f"{name}.{c}[{i}]: {a!r} != {b!r} ({ca} vs {cb})"


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


def test_harness_catches_int_float_drift():
    """Seeded mutation: identical values but int64 vs float64 dtype must
    fail (this is exactly the DuckDB HUGEINT->float64 artifact that flipped
    the driver hash for pack_sequences/unigram_logprob in round 2)."""
    ints = pd.DataFrame({"k": ["a", "b"], "v": pd.array([4, 5], dtype="int64")})
    floats = pd.DataFrame({"k": ["a", "b"], "v": np.array([4.0, 5.0])})
    with pytest.raises(AssertionError, match="dtype kind"):
        _compare("seeded_mutation", ints, floats)


def test_harness_catches_float_value_drift():
    a = pd.DataFrame({"v": np.array([1.0000001])})
    b = pd.DataFrame({"v": np.array([1.0000002])})
    with pytest.raises(AssertionError):
        _compare("seeded_float_mutation", a, b)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["url", "depth", "seq", "mdx_len", "doc_key"]
