"""Physical-plan regression tests: the scale properties README.md claims
(pushdown, pruned scans, broadcast dims, no Python in hot paths) are
asserted here so a refactor can't silently lose them.
"""

from __future__ import annotations

import contextlib
import io

import pytest


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    import __spark_entry__ as e

    qs = e.queries()

    def plan_of(name: str) -> str:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    return plan_of


def test_pricing_summary_pushes_filter_and_prunes(plans):
    p = plans("pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # pruned scan: comment column never read
    assert "l_comment" not in p


def test_point_lookup_pushes_key(plans):
    p = plans("order_lookup")
    assert "EqualTo(o_orderkey,1)" in p
    assert "BroadcastHashJoin" in p


def test_star_join_broadcasts_dims(plans):
    p = plans("nation_revenue")
    # all three dimension joins broadcast; no sort-merge join on the fact
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_fuzzy_match_has_no_python_stage(plans):
    p = plans("match_fuzzy_blocked")
    # whole cascade stays JVM-side: no Arrow/Python eval nodes
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "FlatMapGroupsInPandas" not in p


def test_minhash_no_cartesian_and_no_python(plans):
    p = plans("dedup_minhash_lsh")
    assert "CartesianProduct" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_semi_and_anti_joins_planned(plans):
    assert "LeftSemi" in plans("order_priority_semi")
    assert "LeftAnti" in plans("customers_without_orders")
