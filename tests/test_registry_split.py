"""Round-6 registry split invariants: the package must present exactly
the same public surface the single-file registry did, stay within the
per-module size budget, and keep the EAGER set honest."""

from __future__ import annotations

from pathlib import Path

from kinesis_stream_reader_spark import registry

PKG = Path(registry.__file__).parent


def test_queries_and_oracles_align():
    q = registry.queries()
    o = registry.oracle_sql()
    assert len(q) >= 461
    # every oracle belongs to a query; every query is callable
    assert set(o) <= set(q)
    assert all(callable(fn) for fn in q.values())
    # ordering: the priority head leads and is duplicate-free as seen
    head = list(q)[: len(registry._PRIORITY)]
    seen = []
    for n in registry._PRIORITY:
        if n in registry.QUERIES and n not in seen:
            seen.append(n)
    assert head[: len(seen)] == seen


def test_no_module_exceeds_size_budget():
    for mod in PKG.glob("*.py"):
        n = len(mod.read_text().splitlines())
        assert n <= 6000, f"{mod.name} has {n} lines (budget 6000)"


def test_eager_set_is_subset_of_registry():
    assert registry.EAGER_QUERIES <= set(registry.QUERIES)
    # the census-collect trio the round-6 advice called out must be tagged
    for name in (
        "bradley_terry_arena",
        "pelt_changepoints",
        "markov_attribution_removal",
    ):
        assert name in registry.EAGER_QUERIES


def test_registration_is_unique():
    # register() would silently overwrite on a duplicate name; the split
    # must not have duplicated a slice
    names = list(registry.QUERIES)
    assert len(names) == len(set(names))
