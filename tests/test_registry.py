"""Registry hygiene: the query registry IS the product surface
(__spark_entry__ enumerates it), so its invariants are tested like code."""

from __future__ import annotations

import re

from cbde_mapreduce_spark.plans import REGISTRY

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_every_query_documented_and_categorized():
    for name, spec in REGISTRY.items():
        assert (spec.fn.__doc__ or "").strip(), f"{name}: missing docstring"
        assert spec.category, f"{name}: missing category"
        assert re.fullmatch(r"[a-z0-9_]+", name), f"{name}: non-canonical name"


def test_oracles_reference_only_fixture_tables():
    """Oracle SQL may reference only the ten pre-registered views (plus its
    own CTE names) — a stray table name would error only at driver time."""
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        ctes = set(
            re.findall(r"(\w+)\s*(?:\([\w\s,]*\))?\s+AS\s*\(", spec.oracle, re.IGNORECASE)
        )
        refs = set(re.findall(r"(?:FROM|JOIN)\s+([a-zA-Z_]\w*)", spec.oracle))
        table_functions = {"generate_series", "range", "unnest"}
        unknown = refs - set(_TABLES) - ctes - {"LATERAL", "lateral"} - table_functions
        assert not unknown, f"{name}: oracle references unknown relations {unknown}"


def test_driver_window_is_valid():
    """__spark_entry__._PRIORITY must hold exactly 50 existing names — a
    typo would silently shrink the driver's correctness window. A window
    may deliberately stage rows-only names (their no_oracle driver row
    beats another round of nothing — ROTATION.md records each round's
    staging); every other window slot must be an oracled query. Round 10
    stages none: the two former rows-only LSH-sketch names graduated to
    md5-portable oracled queries this round and lead the window as
    changed-oracled names."""
    import __spark_entry__ as E

    P = E._PRIORITY
    assert len(P) == 50
    assert len(set(P)) == 50, "duplicate names in the window"
    staged_rows_only: set[str] = set()
    for n in P:
        assert n in REGISTRY, f"window name {n} not in registry"
        if n not in staged_rows_only:
            assert REGISTRY[n].oracle, f"window name {n} has no oracle"


def test_staleness_tail_covers_registry():
    """_PRIORITY + _STALENESS_TAIL must partition the registry exactly, so
    queries() emits every query once and in the intended drain order."""
    import __spark_entry__ as E

    listed = E._PRIORITY + E._STALENESS_TAIL
    assert len(listed) == len(set(listed)), "duplicates across window+tail"
    assert set(listed) == set(REGISTRY), (
        set(REGISTRY) ^ set(listed)
    )
    # VERDICT r11 ask #9: _ordered_names() has a sorted-order fallback for
    # names the frozen lists miss; pin that the fallback NEVER engages —
    # the emitted order must be exactly the frozen lists, so a rename or
    # late registration can't silently reshuffle the driver window.
    assert E._ordered_names() == listed
