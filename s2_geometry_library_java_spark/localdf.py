"""Small local fixture tables via the pandas+Arrow path.

`spark.createDataFrame(list_of_tuples, schema)` routes through
applySchemaToPythonRDD: a Python->JVM conversion that re-runs as a fresh
Python-worker job on EVERY action over the DataFrame (measured 4-7 s of
fixed cost per evaluation on this host class — several times the whole
query). The Arrow path ships the rows once as Arrow batches and the
resulting relation evaluates JVM-side in milliseconds, so every local
fixture / probe / literal table in the engine goes through here.
"""

from __future__ import annotations

import pandas as pd


def _schema_names(schema: str) -> list[str]:
    return [f.strip().split()[0] for f in schema.split(",")]


def local_df(spark, data, schema: str):
    """createDataFrame for a driver-local list of tuples, Arrow-backed.

    ``schema`` is the usual DDL string ("a int, b string"); columns map
    by position like the plain-list form.
    """
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    pdf = pd.DataFrame(list(data), columns=_schema_names(schema))
    return spark.createDataFrame(pdf, schema=schema)
