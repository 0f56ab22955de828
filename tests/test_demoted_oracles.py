"""Hash-parity for the queries demoted out of the driver's 50-query
window (r5: pricing_summary / top_customers / parts_never_ordered;
r6: kg_qa_true_false): they freed window slots for queries exercising
unique engine machinery, but stay verified here against the exact SQL
they used to run under the driver — same dtype-faithful hash path as
tools/check_contract.py, at sf0.001."""

import duckdb
import pytest

from tests.conftest import SF_DIR
from tools.check_contract import TABLES, frame_hash

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entrymod.DEMOTED_ORACLES))
def test_demoted_query_hash_parity(spark, duck, name):
    qs = entrymod.queries()
    assert name in qs and name not in entrymod.oracle_sql()
    spdf = qs[name](spark, SF_DIR).toPandas()
    sql = entrymod.DEMOTED_ORACLES[name]
    dpdf = duck.sql(sql() if callable(sql) else sql).df()
    assert sorted(spdf.columns) == sorted(dpdf.columns)
    assert len(spdf) == len(dpdf) > 0
    assert frame_hash(spdf) == frame_hash(dpdf)
