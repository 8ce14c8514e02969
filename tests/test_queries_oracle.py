"""Spark-vs-DuckDB oracle equivalence for a representative query subset at
sf0.001 (the full sweep runs in tools/check_oracles.py; the driver gate
re-runs everything at sf0.01)."""

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

SUBSET = [
    "cellid_encode",
    "cell_algebra",
    "tile_counts",
    "pip_contains",
    "knn_brute",
    "knn_cell",
    "minhash_signatures",
    "span_invariant",
    "media_tiles",
    "region_terms",
    "ann_ivf",
    "polygon_relations",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c], errors="raise")
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = canon(entrymod.queries()[name](spark, SF_DIR).toPandas())
    odf = canon(duck.sql(entrymod.oracle_sql()[name]).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf)
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.count()
    assert rows > 0
    assert df.columns == ["doc_id", "offset", "media_ref", "tile_token", "polygon_id"]


def test_knn_cell_equals_brute(spark):
    a = canon(entrymod.queries()["knn_brute"](spark, SF_DIR).toPandas())
    b = canon(entrymod.queries()["knn_cell"](spark, SF_DIR).toPandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
