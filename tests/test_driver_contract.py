"""Driver-contract invariants: the registry and priority list stay
consistent (a typo in either would silently drop a query from the
driver's CORRECTNESS snapshot rather than fail loudly)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__


def test_priority_names_all_registered():
    """Every _DRIVER_PRIORITY name must resolve — the queries() builder
    filters with `if n in QUERIES`, which would hide a typo."""
    qs = __ray_entry__.queries()
    missing = [n for n in __ray_entry__._DRIVER_PRIORITY if n not in qs]
    assert missing == []


def test_priority_names_unique():
    pri = __ray_entry__._DRIVER_PRIORITY
    assert len(pri) == len(set(pri))


def test_oracle_keys_subset_of_queries():
    """Every oracle entry must have a runnable query, and every oracle
    is a non-empty SQL string."""
    qs = __ray_entry__.queries()
    os_ = __ray_entry__.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_priority_leads_registry_order():
    """queries() must emit the priority names first, in order — the
    driver checks only the head of the registry."""
    qs = list(__ray_entry__.queries())
    pri = [n for n in __ray_entry__._DRIVER_PRIORITY if n in set(qs)]
    assert qs[: len(pri)] == pri
