"""Every registered query with an oracle is hash-compared to DuckDB —
the same differential design the reference uses against vanilla Spark
(SparkTestBase.scala:111-150), with DuckDB as the golden engine.
Parametrized over the registry, so new operators are covered on import.
"""

from __future__ import annotations

import pytest

from celeborn_spark import registry
from tests.conftest import SF_DIR
from tests.oracle import assert_matches_oracle, duck_connection

QUERIES = registry.queries()
ORACLES = registry.oracles()


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, con, ORACLES[name], name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
