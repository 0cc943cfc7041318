"""read_table must not leak session-level conf changes (ADVICE r3): the
events NTZ->LTZ normalization pins UTC only around the cast (analysis-time
zoneId capture) and restores the caller's timezone, and the produced
instants are NTZ-as-UTC regardless of what the session timezone was."""

from __future__ import annotations

from pyspark.sql import functions as F

from responsive_pub_spark.sources.readers import read_table

from tests.conftest import SF_DIR


def test_read_events_restores_session_timezone(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = read_table(spark, SF_DIR, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        assert dict(df.dtypes)["ts"] == "timestamp"
        # instants must equal the UTC interpretation: re-derive under an
        # explicitly-UTC session and compare epoch micros
        ny_micros = df.select(F.unix_micros("ts").alias("m")).orderBy("m").limit(5).collect()
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df_utc = read_table(spark, SF_DIR, "events")
        utc_micros = (
            df_utc.select(F.unix_micros("ts").alias("m")).orderBy("m").limit(5).collect()
        )
        assert [r.m for r in ny_micros] == [r.m for r in utc_micros]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
