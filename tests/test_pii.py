"""pii_counts / redact_pii (operators/textstats.py): detection counts,
redaction output, engine-parity of the regex subset vs DuckDB RE2."""

from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators import textstats

DOCS = [
    (1, "reach me at alice.smith+work@example.co.uk or bob@test.org thanks"),
    (2, "server at 192.168.0.1 and 10.0.0.255 responded"),
    (3, "mixed: carol@host.com from 172.16.4.2 at night"),
    (4, "no pii here just words"),
    (5, ""),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_counts(spark):
    ne, ni = textstats.pii_counts("text")
    out = {
        r["doc_id"]: (r["n_emails"], r["n_ipv4"])
        for r in _df(spark).select("doc_id", ne, ni).collect()
    }
    assert out == {1: (2, 0), 2: (0, 2), 3: (1, 1), 4: (0, 0), 5: (0, 0)}


def test_redaction(spark):
    out = {
        r["doc_id"]: r["red"]
        for r in _df(spark)
        .select("doc_id", textstats.redact_pii("text").alias("red"))
        .collect()
    }
    assert out[1] == "reach me at <EMAIL> or <EMAIL> thanks"
    assert out[2] == "server at <IP> and <IP> responded"
    assert out[3] == "mixed: <EMAIL> from <IP> at night"
    assert out[4] == "no pii here just words"


def test_duckdb_regex_parity(spark, duck):
    """The PII patterns live in the Java-regex / RE2 common subset: both
    engines must find the same spans and produce identical redactions."""
    import pandas as pd

    spark_rows = sorted(
        (r["doc_id"], r["red"], r["ne"], r["ni"])
        for r in _df(spark)
        .select(
            "doc_id",
            textstats.redact_pii("text").alias("red"),
            textstats.pii_counts("text")[0].alias("ne"),
            textstats.pii_counts("text")[1].alias("ni"),
        )
        .collect()
    )
    duck.register("pii_docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    duck_rows = sorted(
        tuple(t)
        for t in duck.execute(
            f"""
        SELECT doc_id,
          regexp_replace(regexp_replace(text,
              '{textstats.PII_EMAIL}', '<EMAIL>', 'g'),
              '{textstats.PII_IPV4}', '<IP>', 'g') AS red,
          len(regexp_extract_all(text, '{textstats.PII_EMAIL}')) AS ne,
          len(regexp_extract_all(text, '{textstats.PII_IPV4}')) AS ni
        FROM pii_docs
        """
        ).fetchall()
    )
    duck.unregister("pii_docs")
    assert spark_rows == duck_rows
