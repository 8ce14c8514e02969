"""Plan-regression guards (round-4 verdict #6): the driver registry must
stay within the 50-row CORRECTNESS artifact cap, and no gate's physical
plan may regress to row-at-a-time Python (BatchEvalPython) or an
unbounded cartesian product.

`explain` is plan-only — nothing executes, so the full registry sweep is
cheap enough for the default test run.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

#: The driver records at most 50 CORRECTNESS rows (observed: r4 registered
#: 54 gates, the artifact carried exactly the first 50 in registry order).
DRIVER_GATE_CAP = 50


def test_registry_fits_driver_cap():
    qs = entrymod.queries()
    assert len(qs) <= DRIVER_GATE_CAP, (
        f"registry has {len(qs)} gates; the driver records only the first "
        f"{DRIVER_GATE_CAP} — merge related gates (see q_region_contains)"
    )


def test_every_query_has_oracle():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(qs) - set(oracles) == set()


def _plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_no_python_row_loop_or_cartesian(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    plan = _plan_text(df)
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
