"""Named StructTypes for every input table.

The reference addresses fields positionally (``TupleN`` with ``f0..fN``,
VehicleTelematics.java:195-253); this engine is named-columns-only — the
schemas below are the single source of truth for column meaning.

``CAR_REPORTS`` mirrors ``CarData`` (VehicleTelematics.java:195-203);
``TAXI_TRIPS`` mirrors the 19-column TLC yellow-taxi layout parsed by
CongestionArea.java:33-42 / SaturatedVendor.java:40-49 (FIXTURES.md §2).
Driver testdata schemas (TESTDATA.md) are declared so parquet reads never
rely on inference.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference-shaped inputs -------------------------------------------------

#: Highway car reports — CarData (VehicleTelematics.java:195-203). CSV form:
#: ``time,vid,spd,xway,lane,dir,seg,pos`` — 8 ints, no header, ascending time.
CAR_REPORTS = T.StructType(
    [
        T.StructField("time", T.IntegerType(), False),  # event time, seconds
        T.StructField("vid", T.IntegerType(), False),  # vehicle id
        T.StructField("spd", T.IntegerType(), False),  # speed, mph
        T.StructField("xway", T.IntegerType(), False),  # highway id
        T.StructField("lane", T.IntegerType(), False),  # lane 0-4
        T.StructField("dir", T.IntegerType(), False),  # 0 east (pos grows), 1 west
        T.StructField("seg", T.IntegerType(), False),  # segment 0-99
        T.StructField("pos", T.IntegerType(), False),  # position, meters
    ]
)

#: NYC yellow-taxi trip records — TLC column order (FIXTURES.md §2).  Only the
#: four starred columns are read by queries; the rest exist for schema
#: fidelity.  ``congestion_surcharge`` may be absent in short rows — the
#: reference treats that as 0.0 (CongestionArea.java:39-40), reproduced by a
#: permissive read + coalesce (see sources.readers).
TAXI_TRIPS = T.StructType(
    [
        T.StructField("vendor_id", T.IntegerType(), True),  # *
        T.StructField("tpep_pickup_datetime", T.TimestampType(), True),  # *
        T.StructField("tpep_dropoff_datetime", T.TimestampType(), True),  # *
        T.StructField("passenger_count", T.DoubleType(), True),
        T.StructField("trip_distance", T.DoubleType(), True),
        T.StructField("ratecode_id", T.DoubleType(), True),
        T.StructField("store_and_fwd_flag", T.StringType(), True),
        T.StructField("pu_location_id", T.IntegerType(), True),
        T.StructField("do_location_id", T.IntegerType(), True),
        T.StructField("payment_type", T.IntegerType(), True),
        T.StructField("fare_amount", T.DoubleType(), True),
        T.StructField("extra", T.DoubleType(), True),
        T.StructField("mta_tax", T.DoubleType(), True),
        T.StructField("tip_amount", T.DoubleType(), True),
        T.StructField("tolls_amount", T.DoubleType(), True),
        T.StructField("improvement_surcharge", T.DoubleType(), True),
        T.StructField("total_amount", T.DoubleType(), True),  # *
        T.StructField("congestion_surcharge", T.DoubleType(), True),  # * may be absent
        T.StructField("airport_fee", T.DoubleType(), True),
    ]
)

# --- driver testdata (TESTDATA.md) ------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)

#: All driver parquet tables, name -> filename stem.
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
