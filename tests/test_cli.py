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


def test_headline_membership_rule():
    """bench.HEADLINE must reconcile with the registry under the
    documented rule: every registered query is benchmarked except the
    explicit scalar/point-lookup and dominated-variant lists (review
    r6: the rule was false at introduction — this pins it true)."""
    import importlib.util
    import os as _os
    import sys as _sys

    bench_path = _os.path.join(_os.path.dirname(__file__), _os.pardir, "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", bench_path)
    bench = importlib.util.module_from_spec(spec)
    _sys.modules["bench_mod"] = bench
    spec.loader.exec_module(bench)
    from firmable_company_data_pipeline_spark.queries import registry

    queries, _ = registry()
    scalar_demos = {
        "fn_clean_text", "fn_domain_company", "fn_abn_checksum",
        "fn_extract_abn_text", "fn_contacts", "fn_standardize_state",
        "fn_clean_company_name", "fn_dates", "fn_snippet", "order_lookup",
    }
    dominated = {
        "orders_page", "dedup_clusters", "match_rule_based", "match_llm_stub",
    }
    headline = set(bench.HEADLINE)
    assert len(bench.HEADLINE) == len(headline), "duplicates in HEADLINE"
    assert headline <= set(queries), sorted(headline - set(queries))
    missing = set(queries) - headline - scalar_demos - dominated
    assert not missing, f"registered but unbenchmarked (extend HEADLINE): {sorted(missing)}"
    assert not (headline & (scalar_demos | dominated)), "excepted query in HEADLINE"
