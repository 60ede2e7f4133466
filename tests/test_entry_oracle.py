"""Local mirror of the driver's correctness gate: every ``queries()`` entry
with an ``oracle_sql()`` is run on Spark (sf0.01) and DuckDB and must match
on row count, column set, and order-insensitive values."""

from __future__ import annotations

import importlib.util
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_CORRECTNESS

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__", Path(__file__).resolve().parents[1] / "__spark_entry__.py"
)
entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(entry_mod)


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(6)
        elif str(pdf[c].dtype).startswith(("uint", "int", "Int")):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


NAMES = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_CORRECTNESS)
    got = _normalize(sdf.toPandas())
    want = _normalize(duck.sql(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    # driver compares order-insensitive value *hashes* -> require bit-exact
    # equality after each side's own round() (floats are pre-rounded in both
    # the Spark plan and the oracle SQL)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_all_queries_have_oracle_or_are_flagged():
    missing = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    # non-SQL-expressible ops must be explicitly declared
    assert missing == entry_mod.NON_SQL, f"undeclared oracle-less queries: {missing - entry_mod.NON_SQL}"


@pytest.mark.parametrize("name", sorted(entry_mod.NON_SQL))
def test_non_sql_queries_smoke(spark, name):
    """Rows-only check for declared non-SQL ops (the driver's weak gate)."""
    df = entry_mod.queries()[name](spark, SF_CORRECTNESS)
    assert df.count() > 0
