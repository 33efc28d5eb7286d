"""The external driver verifies only queries()[:50]; the registry's
_DRIVER_WINDOW_PRIORITY list is therefore a load-bearing contract.
Pin it: the first 50 registry entries must be exactly the priority
list, in order, so a new module registration can never silently shift
which queries the correctness gate checks."""

from __future__ import annotations


def test_first_50_queries_match_priority_window():
    import __spark_entry__ as e
    from firmable_company_data_pipeline_spark.queries import _DRIVER_WINDOW_PRIORITY

    names = list(e.queries())
    window = [n for n in _DRIVER_WINDOW_PRIORITY]
    # The list is EXACTLY the 50-name audited window (tightened round 7
    # to match registry()'s own guard — a backlog-bearing list was the
    # round-5 convention; carrying extra names now raises in registry()):
    # the driver checks exactly queries()[:50], so pin that prefix so
    # module registration order can never shift it.
    assert len(window) == 50, (
        f"priority list has {len(window)} entries; the driver checks "
        "exactly the first 50"
    )
    assert names[: len(window)] == window
    assert len(set(window)) == len(window), "duplicate names in the window"
    # every registered query has an oracle (full gate coverage).  The
    # rows-only set is EMPTY as of round 5: pagerank, the last member,
    # was reformulated in scaled-integer arithmetic so its sums are
    # order-independent and hash-checkable (operators/graph.py).
    assert set(e.oracle_sql()) == set(names)
