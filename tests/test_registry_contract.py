"""Driver-contract invariants over the __spark_entry__ registry.

These run without a Spark session: they guard the contract shape the
driver consumes (key alignment, oracle parseability, window hygiene)
so a registry edit can't silently break the correctness artifact.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def registry():
    return entry.queries(), entry.oracle_sql()


def test_every_oracle_key_is_a_query(registry):
    qs, osql = registry
    assert set(osql) <= set(qs), sorted(set(osql) - set(qs))


def test_all_queries_callable_and_named(registry):
    qs, _ = registry
    assert len(qs) >= 50  # the driver records the first 50
    for name, fn in qs.items():
        assert callable(fn), name
        assert name == name.lower() and " " not in name


def test_driver_window_is_oracle_dense(registry):
    """The first 50 entries are what CORRECTNESS_r{N} records — the
    rotation policy (COVERAGE.md) keeps hash-checkable queries there;
    rows-only entries in the window must stay a small minority."""
    qs, osql = registry
    window = list(qs)[:50]
    rows_only = [n for n in window if n not in osql]
    assert len(rows_only) <= 10, rows_only


def test_every_oracle_parses_and_runs_in_duckdb(registry):
    _, osql = registry
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    for name, sql in osql.items():
        try:
            cols = [d[0] for d in con.execute(
                f"SELECT * FROM ({sql}) LIMIT 0").description]
        except Exception as exc:  # pragma: no cover - assertion payload
            pytest.fail(f"{name}: oracle SQL failed: {exc}")
        assert len(cols) == len(set(cols)), (name, cols)
        assert all(c == c.lower() for c in cols), (name, cols)
