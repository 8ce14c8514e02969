"""JVM Column encoder == numpy kernel, bit for bit (cross-checked at 2M+4M
points during development; 100k here to keep the suite fast)."""

from pyspark.sql import functions as F

from s2_geometry_library_java_spark.functions import encode_cols, udfs
from s2_geometry_library_java_spark.sources import geo


def test_jvm_encoder_equals_kernel(spark):
    base = spark.range(100_000).select(
        F.col("id"),
        geo.lat_col("id").alias("lat"),
        geo.lng_col("id").alias("lng"),
    )
    both = encode_cols.with_cell_id(base, "lat", "lng", "a").withColumn(
        "b", udfs.cell_id_from_latlng_deg(F.col("lat"), F.col("lng"), 30)
    )
    assert both.where(F.col("a") != F.col("b")).count() == 0


def test_jvm_encoder_level(spark):
    base = spark.range(1000).select(
        F.col("id"),
        geo.lat_col("id").alias("lat"),
        geo.lng_col("id").alias("lng"),
    )
    from s2_geometry_library_java_spark.functions import columns as cc

    lv = (
        encode_cols.with_cell_id(base, "lat", "lng", "c", level=9)
        .select(cc.level("c").alias("lvl"))
        .distinct()
        .collect()
    )
    assert [r["lvl"] for r in lv] == [9]
