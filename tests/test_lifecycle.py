"""End-to-end platform-lifecycle simulation: the reference's full script-node
flow (Action XML → catalog load → user script → FinalOutput → UpdateJob →
PMML), with the orchestrator mocked — proving the compat layer composes the
way the platform used it (reference R/DataFrameOperationR.R:306-323 and the
embedded example script at :328)."""

from __future__ import annotations

import glob
import os

from ddataframeoperation_spark import compat


ACTION_XML = """<Action>
  <UUID>task-42</UUID><ExperimentId>exp-7</ExperimentId>
  <NodeId>node-3</NodeId><ServiceUrl>http://orchestrator</ServiceUrl>
  <Property Name='ApplyTransformationTo'><![CDATA[
dfs = DataframeOpr.PerformLoadData(...)
out = dfs['DiagnosticData']
DataframeOpr.FinalOutput(out)
]]></Property>
</Action>"""


def test_full_script_node_lifecycle(spark, sf_dir, tmp_path):
    # 1. Orchestrator hands the node its Action XML.
    action = compat.parse_action_xml(ACTION_XML)
    assert action["node_id"] == "node-3"

    # 2. Node asks for its table metadata and builds the catalog
    #    (metadata_fetcher stands in for the GetDataSourceSchema POST).
    def fake_rest_metadata():
        return [
            {
                "TABLE_NAME": "DiagnosticData",
                "DataLocation": f"{sf_dir}/events.parquet",
                "ColumnList": [
                    {"MappedAliasName": "event_id", "DataType": "long"},
                    {"MappedAliasName": "ts", "DataType": "long"},
                    {"MappedAliasName": "user_id", "DataType": "long"},
                    {"MappedAliasName": "event_type", "DataType": "string"},
                    {"MappedAliasName": "value", "DataType": "double"},
                    {"MappedAliasName": "props", "DataType": "string"},
                ],
            }
        ]

    cat = compat.perform_load_data(spark, metadata_fetcher=fake_rest_metadata)
    assert "DiagnosticData" in cat

    # 3. "User script" transforms the table (what the CDATA script would do).
    out_df = cat["DiagnosticData"].groupBy("event_type").count()

    # 4. FinalOutput writes data + manifest + PMML and reports status.
    posts = []
    manifest = compat.final_output(
        out_df,
        str(tmp_path / "out"),
        job_reporter=lambda loc, status: posts.append((loc, status)),
        write_pmml=True,
        script=action["script"],
    )
    assert posts[-1][1] == 2  # success status code (reference :218)
    assert manifest["MetaData"] == "event_type, count"
    assert glob.glob(os.path.join(manifest["DataLocation"], "part-*"))
    pmml_file = os.path.join(manifest["PMMLLocation"], "part-00000")
    pmml = open(pmml_file).read()
    assert "DataframeOpr.FinalOutput" in pmml  # script embedded
    assert pmml.count("<FieldRef") == 2

    # 5. UpdateJob posts the manifest to the orchestrator.
    calls = []
    compat.update_job(
        lambda url, payload: calls.append((url, payload)),
        action["service_url"],
        action["uuid"],
        action["experiment_id"],
        action["node_id"],
        manifest["DataLocation"],
        2,
    )
    (url, payload), = calls
    assert url == "http://orchestrator/Updatejob"
    assert payload["ParameterValue"]["JobID"] == "application_task-42"


def test_failure_path_reports_status_3(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "x int")
    posts = []
    try:
        compat.final_output(
            df,
            # invalid: file path exists as a FILE so directory write fails
            "/dev/null/impossible",
            job_reporter=lambda loc, status: posts.append(status),
        )
    except Exception:
        pass
    assert posts == [3]  # failure status (reference :317-321)
