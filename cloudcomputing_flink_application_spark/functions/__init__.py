"""Scalar expression helpers (all JVM-side Column expressions, no Python UDFs)."""

from cloudcomputing_flink_application_spark.functions.scalar import (  # noqa: F401
    avg_half_up_cents,
    int_div,
    mph_from_speed_mps,
    trunc_to_int,
    ts_fmt,
)
