"""Driver-window rotation arithmetic, COMPUTED instead of hand-counted.

The driver oracle-checks only the first 50 registered queries each
round; ``_WINDOW_PRIORITY`` pins that order. Round 8 miscounted the
boundary by hand and silently dropped a query out of the window;
round 9's comment then miscounted the registry size. This test does
the arithmetic from the ``CORRECTNESS_r*.json`` history so neither
mistake can recur: every query whose evidence would otherwise age
past two rounds must sit inside the current window.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_green_rounds() -> tuple[dict[str, int], int]:
    """{query: last round with a passing driver row}, and the newest
    round number found on disk."""
    rounds: dict[str, int] = {}
    latest = 0
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        r = int(m.group(1))
        latest = max(latest, r)
        for name, row in json.load(open(f)).items():
            if row.get("hash_match") or row.get("rows_match"):
                rounds[name] = max(rounds.get(name, 0), r)
    return rounds, latest


def test_window_is_the_50_stalest_queries():
    """The 50-slot window must hold exactly the 50 stalest-evidence
    queries: never-checked queries (stalest of all — they can never
    earn a driver row outside the window) plus the oldest last-green
    rounds. Ties within one evidence round may be broken either way,
    so the assertion compares the MULTISET of evidence rounds inside
    the window against the 50 smallest overall, not a fixed name
    list.

    Why not the old "nothing older than 2 rounds" rule: with more
    than 150 registered queries a 50-slot window arithmetically
    cannot keep every query within 2 rounds — the attainable cycle is
    ceil(N/50) rounds, and "stalest first" is the schedule that
    achieves it. The failure message still enumerates the rotation
    the coming round must make."""
    from oups_spark.queries import REGISTRY, load_all_query_modules

    load_all_query_modules()
    names = list(REGISTRY)
    window = names[:50]
    rounds, latest = _last_green_rounds()
    assert latest >= 9  # sanity: history present

    never = [n for n in names if n not in rounds]
    new_outside = [n for n in never if n not in set(window)]
    assert new_outside == [], (
        f"never-checked queries outside the 50-slot window: "
        f"{new_outside} (they can never earn driver evidence there)"
    )

    evidence = sorted(rounds.get(n, 0) for n in names)
    want = evidence[:50]
    got = sorted(rounds.get(n, 0) for n in window)
    if got != want:
        threshold = want[-1]
        too_fresh = sorted(
            (n for n in window if rounds.get(n, 0) > threshold),
            key=lambda n: rounds.get(n, 0),
        )
        staler_outside = sorted(
            (n for n in names[50:] if rounds.get(n, 0) < threshold),
            key=lambda n: rounds.get(n, 0),
        )
        raise AssertionError(
            f"window is not the 50 stalest queries: rotate OUT "
            f"{too_fresh} (evidence newer than r{threshold}) and "
            f"rotate IN the staler queries {staler_outside}"
        )
    # the window must not be underfilled while stale slots exist
    assert len(names) >= 50 and len(window) == 50


def test_window_priority_is_exact_and_fully_registered():
    """_WINDOW_PRIORITY's head IS the window (no name may be skipped
    by the 'if n in REGISTRY' filter — a typo would quietly reshuffle
    slots), and every listed name is registered."""
    from oups_spark.queries import (
        _WINDOW_PRIORITY,
        REGISTRY,
        load_all_query_modules,
    )

    load_all_query_modules()
    missing = [n for n in _WINDOW_PRIORITY if n not in REGISTRY]
    assert missing == [], missing
    assert list(REGISTRY)[:50] == _WINDOW_PRIORITY[:50]


def test_plans_md_has_one_section_per_registered_query():
    """PLANS.md is part of the auditability story (VERDICT r9 ask
    #3): it must carry exactly one dumped plan section per registered
    query and no 'plan unavailable' placeholders, so it cannot drift
    as queries land. Regenerate with tools/plan_dump.py."""
    from oups_spark.queries import REGISTRY, load_all_query_modules

    load_all_query_modules()
    text = open(os.path.join(REPO, "PLANS.md")).read()
    sections = {
        m.group(1) for m in re.finditer(r"^## (\S+)$", text, re.MULTILINE)
    }
    missing = sorted(set(REGISTRY) - sections)
    extra = sorted(sections - set(REGISTRY))
    assert missing == [], f"queries with no plan section: {missing}"
    assert extra == [], f"plan sections for unregistered queries: {extra}"
    assert "plan unavailable" not in text


def test_readme_query_count_matches_registry():
    """Prose counts drift (round 8's '122', round 10's '133' — both
    by-hand miscounts, VERDICT r10 wrong #3): the README's 'All N
    registered queries' claim must equal len(REGISTRY)."""
    from oups_spark.queries import REGISTRY, load_all_query_modules

    load_all_query_modules()
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"All (\d+) registered queries", text)
    assert m, "README lost its registry-count sentence"
    assert int(m.group(1)) == len(REGISTRY), (
        f"README says {m.group(1)} queries, registry has {len(REGISTRY)}"
    )
