"""Registry integrity: the driver's correctness gate checks only the
first 50 entries of ``queries()`` iteration order, so the registry
itself needs invariants (VERDICT r4 items #4 and #10):

* ``_PRIORITY`` is exactly the 50-name driver window and every name
  in it resolves to a registered query — a future add can't silently
  push a never-validated query out of the window.
* The registry never silently shrinks: a broken query-module import
  fails the suite instead of dropping ~25 queries from the gate.
"""

from __future__ import annotations

import builtins

import pytest

from spark_relieffc_fselection_spark import queries as q
from spark_relieffc_fselection_spark.queries import (
    _CURRENT_ROUND,
    _DEFERRED,
    _PRIORITY,
    all_oracles,
    all_queries,
)

#: Registry floor as of round 11. Raise when queries are added; a drop
#: below this means an import path silently lost a module.
MIN_REGISTRY_SIZE = 181


def test_priority_is_exactly_the_driver_window():
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50  # no duplicate slots


def test_priority_names_all_registered():
    names = set(all_queries())
    missing = set(_PRIORITY) - names
    assert not missing, f"_PRIORITY names with no registered query: {missing}"


def test_priority_is_iteration_prefix():
    first50 = list(all_queries())[:50]
    assert first50 == list(_PRIORITY)


def test_registry_never_shrinks():
    reg = all_queries()
    assert len(reg) >= MIN_REGISTRY_SIZE, (
        f"registry has {len(reg)} queries, expected >= {MIN_REGISTRY_SIZE} — "
        "a query module import probably failed"
    )


def test_oracles_reference_registered_queries():
    reg = set(all_queries())
    assert set(all_oracles()) <= reg


def test_priority_and_deferred_partition_the_registry():
    """Rotation honesty (VERDICT r5 #10): every registered query must
    either hold a driver-window slot (_PRIORITY) or be documented in
    _DEFERRED with the round it was last driver-green. A new query
    added without touching either is a silent gate escape — fail."""
    reg = set(all_queries())
    window = set(_PRIORITY)
    deferred = set(_DEFERRED)
    assert not (window & deferred), (
        f"names in BOTH _PRIORITY and _DEFERRED: {window & deferred}"
    )
    undocumented = reg - window - deferred
    assert not undocumented, (
        f"registered queries neither in the driver window nor on the "
        f"documented deferred list: {sorted(undocumented)}"
    )
    stale = deferred - reg
    assert not stale, f"_DEFERRED names with no registered query: {sorted(stale)}"


def test_deferred_staleness_bound():
    """Rotation debt can never silently age past what one 50-slot
    window can repay (VERDICT r6 #7): every deferred query must have
    been driver-green within the last 3 rounds. Bumping _CURRENT_ROUND
    without rotating the oldest cohort into _PRIORITY fails here."""
    too_stale = {
        n: r for n, r in _DEFERRED.items() if _CURRENT_ROUND - r > 3
    }
    assert not too_stale, (
        f"deferred queries older than 3 rounds (current={_CURRENT_ROUND}); "
        f"rotate them into _PRIORITY: {sorted(too_stale)}"
    )


def test_deferred_rounds_are_plausible():
    """_DEFERRED values are CORRECTNESS rounds (1..current); a 0 would
    mean 'never driver-green', which is only allowed a window slot."""
    bad = {n: r for n, r in _DEFERRED.items() if not (1 <= r <= 20)}
    assert not bad, f"deferred entries with no plausible green round: {bad}"


def test_broken_query_module_fails_loudly(monkeypatch):
    """A typo'd import inside one of our own query modules must raise,
    not silently shrink the gate (VERDICT r4 #4)."""
    real_import = builtins.__import__

    def broken(name, *args, **kwargs):
        if name == "spark_relieffc_fselection_spark.queries.trainprep_q":
            raise ImportError(
                "No module named 'spark_relieffc_fselection_spark.operators.typo'",
                name="spark_relieffc_fselection_spark.operators.typo",
            )
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", broken)
    with pytest.raises(ImportError, match="trainprep_q"):
        q._load_modules()


def test_missing_optional_dep_is_tolerated(monkeypatch):
    """Only a genuinely-optional third-party dependency (PIL,
    soundfile) may be absent without failing the registry load."""
    real_import = builtins.__import__

    def no_pil(name, *args, **kwargs):
        if name == "spark_relieffc_fselection_spark.queries.multimodal_q":
            raise ImportError("No module named 'PIL'", name="PIL")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", no_pil)
    q._load_modules()  # must not raise
