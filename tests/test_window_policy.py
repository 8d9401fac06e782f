"""Driver-window composition invariants: the manual priority block leads
(new/changed queries), and everything after it rotates STALEST-GREEN-FIRST
from the driver's own CORRECTNESS_r*.json records — so un-prioritized
queries cannot accumulate stale greens (VERDICT r4's staleness ask)."""

from __future__ import annotations

from thesis_iceberg_spark.queries import (
    DRIVER_WINDOW_PRIORITY,
    _last_green_rounds,
    queries,
)


def test_priority_block_is_capped():
    """Structural guard (VERDICT r6 'What's wrong' #1): the manual block
    exists for THIS round's new/changed queries only.  If it ever grows
    toward the 50-slot driver window again, the stalest-first fallback
    goes dead and greens silently go stale — so hard-cap it well below
    the window size."""
    from thesis_iceberg_spark.queries import _PRIORITY_CAP

    assert _PRIORITY_CAP <= 16  # window 50 - cap >= 34 rotation slots
    assert len(DRIVER_WINDOW_PRIORITY) <= _PRIORITY_CAP
    # With the cap respected, every never-driver-checked query and every
    # stalest-green query must land inside the 50-query window.
    names = list(queries().keys())
    win = set(names[:50])
    lg = _last_green_rounds()
    never = [n for n in names if n not in lg]
    assert all(n in win for n in never), "never-checked must be in window"
    if lg:
        oldest = min(lg.values())
        stalest = [n for n in names if lg.get(n) == oldest]
        assert all(n in win for n in stalest), "stalest greens must be in window"


def test_priority_block_leads_and_remainder_is_stalest_first():
    names = list(queries().keys())
    # unregistered priority names are skipped harmlessly
    prio = [n for n in DRIVER_WINDOW_PRIORITY if n in names]
    assert names[: len(prio)] == prio
    assert len(set(prio)) == len(prio), "no duplicate priority names"
    lg = _last_green_rounds()
    rest = names[len(prio):]
    rounds = [lg.get(n, -1) for n in rest]
    assert rounds == sorted(rounds), "remainder must be oldest-green first"


def test_last_green_rounds_requires_full_green(tmp_path, monkeypatch):
    import json

    from thesis_iceberg_spark import queries as qmod

    (tmp_path / "thesis_iceberg_spark" / "queries").mkdir(parents=True)
    fake_init = tmp_path / "thesis_iceberg_spark" / "queries" / "__init__.py"
    fake_init.write_text("")
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps(
            {
                "good": {"rows_match": True, "schema_match": True,
                         "hash_match": True, "err": None},
                "hash_fail": {"rows_match": True, "schema_match": True,
                              "hash_match": False, "err": None},
                "errored": {"rows_match": True, "schema_match": True,
                            "hash_match": True, "err": "boom"},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps(
            {"good": {"rows_match": True, "schema_match": True,
                      "hash_match": True, "err": None}}
        )
    )
    (tmp_path / "CORRECTNESS_rXX.json").write_text("not json")
    monkeypatch.setattr(qmod, "__file__", str(fake_init))
    lg = qmod._last_green_rounds()
    assert lg == {"good": 5}  # newest green only; partial rows never count
