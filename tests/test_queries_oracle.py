"""Replicates the driver's correctness gate locally at sf0.001:
run every ``queries()`` entry; where ``oracle_sql()`` has a match, run
it in DuckDB over the same parquet tables and compare row count, schema
(column names) and values (order-insensitive, columns sorted by name)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(result, Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@pytest.fixture(scope="module")
def con():
    # mirror the driver: oracle_sql() materializes the fixed-corpus and
    # expected-output parquet files the flagship/media SQL reads
    from ocr_processor_ray.queries_catalog import ensure_oracle_inputs

    ensure_oracle_inputs()
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _oracle_names():
    from ocr_processor_ray.queries_catalog import ORACLE_SQL

    return sorted(ORACLE_SQL)


def _rows_only_names():
    from ocr_processor_ray.queries_catalog import ORACLE_SQL, QUERIES

    return sorted(set(QUERIES) - set(ORACLE_SQL))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name, con):
    from ocr_processor_ray.queries_catalog import ORACLE_SQL, QUERIES

    got = _canon(_to_pandas(QUERIES[name](SF_DIR)))
    want = _canon(con.sql(ORACLE_SQL[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_query_runs(name):
    from ocr_processor_ray.queries_catalog import QUERIES

    df = _to_pandas(QUERIES[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0
    # deterministic across invocations
    df2 = _to_pandas(QUERIES[name](SF_DIR))
    pd.testing.assert_frame_equal(_canon(df), _canon(df2))
