"""Spark-vs-DuckDB oracle parity for every entry in queries() —
a local mirror of the driver's CORRECTNESS gate (row count + sorted
value equality, exact, including rounded floats)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from cloud_volume_spark.operators import (
    all_oracle_sql, all_queries, retired_oracle_sql, retired_queries,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# registry + retired tier: retirement frees driver-window slots, it
# never drops local cross-engine coverage
QUERIES = {**all_queries(), **retired_queries()}
ORACLES = {**all_oracle_sql(), **retired_oracle_sql()}


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return (
        df.sort_values(by=list(df.columns))
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name, spark, sf_dir, ddb):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = ddb.execute(ORACLES[name]).fetchdf()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs oracle {len(odf)}"
    s = _canon(sdf)
    o = _canon(odf)
    assert list(s.columns) == list(o.columns), (
        f"{name}: columns {list(s.columns)} vs {list(o.columns)}"
    )
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        s_float = np.issubdtype(sv.dtype, np.floating)
        o_float = np.issubdtype(ov.dtype, np.floating)
        # dtype-CLASS must agree: the driver hashes exact string reprs,
        # so an int column on one side and float on the other ("3849"
        # vs "3849.0") fails there even when values match — e.g. an
        # uncast DuckDB SUM() returning HUGEINT→float (r5's
        # token_bucket_stats). Catch it locally.
        assert s_float == o_float, (
            f"{name}: column {c} dtype-class mismatch "
            f"(spark {sv.dtype} vs oracle {ov.dtype}) — add a ::BIGINT "
            f"cast or align types; the driver's exact hash will fail"
        )
        if s_float:
            assert np.allclose(
                sv.astype(np.float64), ov.astype(np.float64),
                rtol=0, atol=0, equal_nan=True,
            ), f"{name}: float column {c} differs"
        else:
            assert np.array_equal(sv, ov), f"{name}: column {c} differs"


def test_all_queries_have_entries():
    # every oracle has a query AND every query has an oracle: since the
    # FakeCodec stream moved to hex-md5 keys (round 4), even the
    # multimodal decode paths are SQL-expressible — nothing ships
    # without a cross-engine check
    assert set(ORACLES) == set(QUERIES)
