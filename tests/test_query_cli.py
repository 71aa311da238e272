"""The query-runner CLI: every registered name invocable, list output
complete, explain path prints a plan."""

from __future__ import annotations

from telescope_data_pipeline_spark.query_cli import main


def test_cli_list_names_every_query(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    from telescope_data_pipeline_spark.queries import all_queries

    for name in all_queries():
        assert name in out


def test_cli_runs_query_and_explain(spark, capsys):
    assert main(["q_agg_count", "--sf-dir", "/root/testdata/sf0.001",
                 "--limit", "5"]) == 0
    out = capsys.readouterr().out
    assert "rows:" in out
    assert main(["q_agg_count", "--sf-dir", "/root/testdata/sf0.001",
                 "--explain"]) == 0
    assert "Physical Plan" in capsys.readouterr().out
