"""Driver-contract meta-tests for ``__spark_entry__``: name hygiene and
the smoke path.  These catch the silent failure modes of the registry
pattern — a duplicate query name shadowing an earlier module's entry
via dict.update, or an oracle key with no matching query."""

from __future__ import annotations

import importlib.util


def _entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_duplicate_query_names_across_modules():
    mod = _entry()
    total = sum(len(m.QUERIES) for m in mod._MODULES)
    merged = mod.queries()
    assert total == len(merged), (
        "duplicate query name across plan modules shadows an entry: "
        f"{total} module entries -> {len(merged)} merged"
    )


def test_every_oracle_key_has_a_query():
    mod = _entry()
    q, o = mod.queries(), mod.oracle_sql()
    orphans = set(o) - set(q)
    assert not orphans, f"oracle entries without queries: {sorted(orphans)}"
    assert all(callable(f) for f in q.values())


def test_entry_smoke(spark):
    rows = _entry().entry(spark).collect()
    assert len(rows) > 0
    assert {"revenue"} <= set(rows[0].asDict()), "flagship schema drifted"


def test_first_fifty_entries_are_all_oracle_paired():
    """The driver hash-verifies only the first 50 queries() entries;
    a rows-only (no-oracle) entry in that window spends a slot on a
    weaker check (r4 verdict), so any such entry must be DECLARED in
    ``_WINDOW_ROWS_ONLY`` (r7: the verdict explicitly budgets slots to
    convert the never-driver-green rows-only residue).  An unpaired
    window entry not in that set is still a wasted-slot bug."""
    mod = _entry()
    q, o = list(mod.queries()), mod.oracle_sql()
    allowed = getattr(mod, "_WINDOW_ROWS_ONLY", frozenset())
    unpaired = [n for n in q[:50] if n not in o and n not in allowed]
    assert not unpaired, f"undeclared no-oracle entries in the window: {unpaired}"
    # the declared rows-only slots must actually be in the window and
    # actually unpaired — a stale declaration hides real waste
    window = set(q[:50])
    stale = [n for n in allowed if n not in window or n in o]
    assert not stale, f"stale _WINDOW_ROWS_ONLY declarations: {stale}"


def test_registry_outputs_are_scalar_columns(spark, sf_dir):
    """The driver's canonicalizer crashes on array/map/struct cells
    (r4: ``embedding_pca_projected`` TypeError: unhashable type 'list'),
    killing even the rows-only count for that entry.  Every registered
    query must therefore emit only scalar columns."""
    complex_cols = []
    for name, fn in _entry().queries().items():
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if t.startswith(("array", "map", "struct")):
                complex_cols.append((name, f.name, t))
    assert not complex_cols, complex_cols


def test_window_is_exactly_the_first_fifty_and_unique():
    """The driver hard-verifies the FIRST 50 queries() entries; the
    _WINDOW tuple must be exactly those, 50 long, duplicate-free —
    a rotation typo (49 slots, a dup, or a name drifting out of the
    prefix) silently wastes a driver slot otherwise."""
    mod = _entry()
    w = mod._WINDOW
    assert len(w) == 50, f"window has {len(w)} slots"
    assert len(set(w)) == 50, "duplicate window entries"
    assert list(mod.queries())[:50] == list(w)


def test_window_names_all_resolve():
    """Every _WINDOW name must exist in the registry (a renamed query
    would KeyError the driver's whole correctness pass)."""
    mod = _entry()
    q = mod.queries()
    missing = [n for n in mod._WINDOW if n not in q]
    assert not missing, missing
