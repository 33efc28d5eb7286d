"""CLI orchestrator smoke: the reference's `python run_pipeline.py` UX
(--demo synthesizes the offline fixture and runs extract→clean→match)."""

from __future__ import annotations

from firmable_company_data_pipeline_spark.__main__ import main


def test_cli_demo_runs_end_to_end(spark, capsys, tmp_path):
    rc = main(["--demo", "--out", str(tmp_path / "matched.parquet")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "matched rows: 3" in out
    assert "observed[cleaned_cc]" in out
    back = spark.read.parquet(str(tmp_path / "matched.parquet"))
    assert back.count() == 3
    assert {r["match_method"] for r in back.collect()} == {"rule_based_abn"}
