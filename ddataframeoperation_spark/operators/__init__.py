"""Operator library — SURVEY.md §2 Part B, one thin Spark-first module per
operator family. Every function takes DataFrames in, returns a DataFrame,
and leaves physical strategy to Catalyst/AQE except where an explicit hint
is the right call at scale (broadcast dims, salted skew keys)."""

from ddataframeoperation_spark.operators import (  # noqa: F401
    relational,
    windows,
    dedup,
    similarity,
    text,
    multimodal,
)
