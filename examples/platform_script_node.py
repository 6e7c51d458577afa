"""Runnable demo: the reference platform's script-node flow on this engine.

Mirrors the embedded example script of the reference platform
(``/root/reference/R/DataFrameOperationR.R:328``):

    from DataFrameOperation import DataframeOpr
    dfs = DataframeOpr.PerformLoadData(taskid, sessionid, url, ...)
    # ... user transformation over dfs['DiagnosticData'] ...
    DataframeOpr.FinalOutput(dfs['DiagnosticData'])

Here the REST orchestrator is stubbed with a local metadata list and the
HDFS tables with the local parquet fixtures; everything else is the same
call shape.

Run: python examples/platform_script_node.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ddataframeoperation_spark.compat import DataframeOpr
from ddataframeoperation_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("platform-demo")

    # 1. "PerformLoadData": catalog from (stubbed) orchestrator metadata.
    dfs = DataframeOpr.PerformLoadData(
        spark,
        table_specs=[
            {"TABLE_NAME": "DiagnosticData", "DataLocation": f"{SF_DIR}/events.parquet"},
            {"TABLE_NAME": "Customers", "DataLocation": f"{SF_DIR}/customer.parquet"},
        ],
    )

    # 2. User transformation (arbitrary DataFrame code, catalog by name).
    out = (
        dfs["DiagnosticData"]
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("event_type")
    )
    out.show()

    # 3. "FinalOutput": CSV + manifest + PMML, job status reported.
    manifest = DataframeOpr.FinalOutput(
        out,
        tempfile.mkdtemp(prefix="pangea_out_"),
        job_reporter=lambda loc, status: print(f"UpdateJob status={status}"),
        write_pmml=True,
        script="out = dfs['DiagnosticData'].groupBy('event_type').count()",
    )
    print("manifest:", manifest)


if __name__ == "__main__":
    main()
