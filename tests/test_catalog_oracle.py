"""The primary correctness gate, run locally: every catalog query with an
oracle must match DuckDB at sf0.01 (mirrors the driver's t2 check)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import compare


def _query_names():
    return sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, spark, oracle_con, sf_correct):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    df = qs[name](spark, sf_correct)
    assert df is not None
    if name not in oracles:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    problems = compare(df, oracle_con, oracles[name])
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
