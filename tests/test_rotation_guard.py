"""Stale-green rotation guard (VERDICT r4 "What's wrong" #1).

greenmap.json records, per registered query, the last round the DRIVER
verified it green and the sha256 of its implementing module at that
round. Rule enforced here: any query whose module content no longer
matches its recorded green must sit inside the 50-query correctness
window so the next driver run re-verifies it — a prior green must never
cover code it did not see.

Maintenance: after a round's CORRECTNESS_rNN.json lands, run
`python tools/update_greenmap.py --round NN` to fold in the new greens
with current module hashes.
"""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "update_greenmap", os.path.join(REPO, "tools", "update_greenmap.py")
)
greenmap_tool = importlib.util.module_from_spec(spec)
spec.loader.exec_module(greenmap_tool)


@pytest.fixture(scope="module")
def window():
    import __spark_entry__ as entry

    return list(entry.queries())[:50]


def test_window_is_exactly_the_gated_prefix(window):
    import __spark_entry__ as entry

    # _WINDOW names must all resolve (a typo would silently shrink the
    # gated set) and fill the 50 checked slots
    assert len(entry._WINDOW) == 50
    assert window == entry._WINDOW


def test_stale_green_queries_are_in_window(window):
    stale = greenmap_tool.stale_queries()
    missing = sorted(set(stale) - set(window))
    assert not missing, (
        f"queries changed since their last driver-green but NOT in the "
        f"correctness window: {missing}. Re-admit them to _WINDOW (or, if "
        f"the window is full, rotate out only untouched greens)."
    )


def test_new_queries_are_in_window(window):
    import __spark_entry__ as entry

    greenmap = json.load(open(os.path.join(REPO, "greenmap.json")))
    never_green = sorted(set(entry.queries()) - set(greenmap))
    missing = sorted(set(never_green) - set(window))
    assert not missing, (
        f"queries with no driver-green on record must debut inside the "
        f"window: {missing}"
    )


def test_dep_closure_sees_operator_imports():
    """VERDICT r5 task 3: the targeted dep closure must catch edits to
    operator modules a query merely imports (the blind spot round 5
    papered over with manual re-windowing). Pinned structurally: the
    closure of the crawl-plan module includes the operator modules it
    imports, transitively within operators//functions//plans, and a
    query's closure deps are a superset of its module-level deps."""
    closure = greenmap_tool._dep_closure(
        "openslack_crawler_spark/plans/round_job.py"
    )
    assert "openslack_crawler_spark/operators/seen_filter.py" in closure
    assert "openslack_crawler_spark/functions/url.py" in closure
    mods = greenmap_tool.query_modules()
    full = greenmap_tool.query_modules(closure=True)
    for name, deps in mods.items():
        assert set(deps) <= set(full[name]), name
    # function-level imports are seen too (url_canonicalize imports the
    # UDF inside the query function)
    assert (
        "openslack_crawler_spark/functions/url.py"
        in full["url_canonicalize"]
    )


def test_greenmap_covers_only_registered_queries():
    import __spark_entry__ as entry

    greenmap = json.load(open(os.path.join(REPO, "greenmap.json")))
    ghosts = sorted(set(greenmap) - set(entry.queries()))
    assert not ghosts, f"greenmap entries for unregistered queries: {ghosts}"
