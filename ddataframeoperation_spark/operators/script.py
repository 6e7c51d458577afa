"""Script-transform surface — the engine's UDF/UDTF boundary (B30).

The reference's entire raison d'être is running a user script over the
table catalog: the orchestrator wraps Python in an Action XML
(``ApplyTransformationTo`` CDATA, reference ``R/DataFrameOperationR.R:328``)
and describes it in PMML as a ``ScriptExecutor`` DefineFunction applied to
FieldRefs (``:556-576``). Here that becomes the idiomatic Spark trio:

- :func:`apply_script_grouped` — grouped-map ``applyInPandas``: script sees
  one group as a pandas DataFrame, returns a pandas DataFrame with a
  declared schema (the platform's ``PredictedName:PredictedDataType``
  contract);
- :func:`apply_script_batches` — ``mapInPandas``: script streams Arrow
  record batches, group-independent;
- :func:`scalar_pandas_udf` — vectorized column function.

Scale notes: all three move data over Arrow in columnar batches — never
row-at-a-time Python. ``applyInPandas`` shuffles on the group key and must
hold ONE GROUP in memory (document that to script authors: a skewed group
is the failure mode; pre-salt or pre-aggregate hot keys). ``mapInPandas``
holds only one Arrow batch (``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "apply_script_grouped",
    "apply_script_batches",
    "scalar_pandas_udf",
]


def apply_script_grouped(
    df: DataFrame,
    group_cols: Sequence[str],
    func: Callable,
    output_schema: StructType | str,
) -> DataFrame:
    """B30 — grouped-map script execution: ``func(pandas.DataFrame) ->
    pandas.DataFrame`` per group, output schema declared up front (the
    Spark rendering of the reference's script node + emitted
    ``MetaData``/``MetaDataType``, A23)."""
    return df.groupBy(*group_cols).applyInPandas(func, schema=output_schema)


def apply_script_batches(
    df: DataFrame,
    func: Callable[[Iterator], Iterator],
    output_schema: StructType | str,
) -> DataFrame:
    """B30 — batch-streaming script execution (``mapInPandas``): for
    group-independent transforms; peak memory is one Arrow batch."""
    return df.mapInPandas(func, schema=output_schema)


def scalar_pandas_udf(func: Callable, return_type: str):
    """B30 — vectorized scalar UDF (Arrow series in/out)."""
    return F.pandas_udf(func, returnType=return_type)


def zscore_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Example script-node workload: per-group z-score normalization via
    ``applyInPandas`` — the canonical grouped-map pattern. Kept in the
    library (not just tests) because it is the declared B30 query surface;
    sample-stddev semantics match SQL ``stddev_samp``."""
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in df.select(*group_cols).dtypes)
        + f", {value_col} double, zscore double"
    )

    def _norm(pdf):
        v = pdf[value_col]
        sd = v.std()  # pandas default: sample stddev (ddof=1)
        z = (v - v.mean()) / sd if sd and sd == sd else v * 0.0
        out = pdf[list(group_cols)].copy()
        out[value_col] = v
        out["zscore"] = z
        return out

    return apply_script_grouped(df, group_cols, _norm, out_schema)
