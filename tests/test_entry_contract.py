"""Driver-contract shape guard: every oracle has a query, every query
runs end-to-end at sf0.001, entry() produces rows with a stable
schema. (The value-level gate is scripts/check_contract.py at
sf0.01; this keeps the contract importable and runnable from pytest.)
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs, oracles = em.queries(), em.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
    # rows-only checks are allowed but should stay rare
    no_oracle = set(qs) - set(oracles)
    assert len(no_oracle) <= 2, f"too many rows-only queries: {no_oracle}"


def test_entry_runs(spark):
    rows = em.entry(spark).collect()
    assert len(rows) > 0
    assert {"l_returnflag", "l_linestatus", "n", "avg_qty", "total_revenue"} == set(
        em.entry(spark).columns
    )


@pytest.mark.parametrize("name", sorted(em.queries()))
def test_query_runs_at_sf0001(spark, name):
    df = em.queries()[name](spark, SF)
    assert df.columns, f"{name}: empty schema"
    df.limit(5).collect()  # end-to-end execution, bounded output
