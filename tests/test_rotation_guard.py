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


def test_greenmap_covers_only_registered_queries():
    import __spark_entry__ as entry

    greenmap = json.load(open(os.path.join(REPO, "greenmap.json")))
    ghosts = sorted(set(greenmap) - set(entry.queries()))
    assert not ghosts, f"greenmap entries for unregistered queries: {ghosts}"
