"""Round-9 operator tests, mirroring the round-8 ADVICE items:

1. write_bucketed's overwrite cleanup must resolve the table's REAL
   location even when a data column is literally named ``Location``
   (DESCRIBE EXTENDED lists data columns before the metadata section).
2. repeated-substring fingerprinting pre-chunks very long documents so
   per-row transient array memory is bounded (and spans are unchanged).
3. classifier scoring switches from a str_to_map literal to a
   broadcast-join weight lookup once the model is large.
"""

import pytest
from pyspark.sql import functions as F


def test_write_bucketed_location_column_shadow(spark, tmp_path):
    # ADVICE r8: a data column named 'Location' used to win the
    # DESCRIBE scan (column rows precede the metadata section), so the
    # "location" became the column's TYPE ('string') and rmtree ran on
    # a bogus relative path while the real location was never cleaned.
    from betl_spark.io.writers import write_bucketed

    name = "t_round9_location_shadow"
    df = spark.range(10).select(
        F.col("id"), F.concat(F.lit("loc_"), F.col("id")).alias("Location")
    )
    try:
        write_bucketed(df, name, ["id"], 2)
        # second write exercises the catalog-resolution branch; before
        # the fix the stale data files survive under the real location
        write_bucketed(df.limit(4), name, ["id"], 2)
        assert spark.table(name).count() == 4
        # and the metadata-section Location row is the one resolved:
        # a third overwrite must also see exactly the latest rows
        write_bucketed(df.limit(7), name, ["id"], 2)
        assert spark.table(name).count() == 7
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
