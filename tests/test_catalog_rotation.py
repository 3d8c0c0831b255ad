"""Driver-window rotation hygiene: the catalog auto-ranks entries
whose DEFINITION (builder source + oracle SQL) changed after their last
green driver row (r6 verdict item 3 — the hand-maintained FORCE_STALE
missed an oracle-only edit).  Pure unit tests, no SparkSession."""

from delta_lake_gcp_implementation_spark.plans import catalog as cat
from delta_lake_gcp_implementation_spark.plans import driver_rows as dr


def test_green_hash_covers_every_catalog_entry_with_a_green_row():
    missing = [
        n for n in cat._SPECS if n in dr.LAST_GREEN and n not in dr.GREEN_HASH
    ]
    assert missing == []


def test_definition_hash_is_stable_and_sensitive():
    spec = cat._SPECS["star_rollup"]
    h1 = cat.definition_hash(spec)
    assert h1 == cat.definition_hash(spec)
    edited = cat.QuerySpec(spec.builder, (spec.oracle_sql or "") + " -- edit")
    assert cat.definition_hash(edited) != h1


def test_synthetic_post_green_edit_auto_ranks_stalest():
    """Corrupt one recorded hash (simulating an edit landing after the
    green row) and assert the ordering pulls that entry to the front of
    the driver window without any FORCE_STALE listing."""
    victim = next(
        n
        for n in cat._SPECS
        if n in dr.GREEN_HASH and n not in cat.FORCE_STALE
        and dr.LAST_GREEN.get(n, 0) >= 5  # would otherwise sort late
    )
    gh = dict(dr.GREEN_HASH)
    gh[victim] = "0" * 16
    ordered = list(cat.ordered_catalog(green_hash=gh))
    # stale group = FORCE_STALE + the synthetic edit, all ahead of the
    # oldest genuine cohort
    front = ordered[: len(cat.FORCE_STALE) + 1]
    assert victim in front
    # untouched ordering keeps the victim far from the front
    assert victim not in list(cat.ordered_catalog())[: len(cat.FORCE_STALE) + 1]


def test_regen_carry_over_never_rehashes_unadvanced_entries(monkeypatch):
    """collect_hashes re-hashes only entries whose green round ADVANCED;
    a post-green edit must keep the OLD recorded hash (and so keep
    flagging) rather than being laundered into 'verified' at regen."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import update_driver_rows as reg

    names = list(dr.GREEN_HASH)
    advanced, steady = names[0], names[1]
    fake_old_hash = {advanced: "a" * 16, steady: "b" * 16}
    fake_old_green = {advanced: 5, steady: 6}
    monkeypatch.setattr(dr, "GREEN_HASH", fake_old_hash)
    monkeypatch.setattr(dr, "LAST_GREEN", fake_old_green)
    out = reg.collect_hashes({advanced: 7, steady: 6})
    # advanced: green round moved 5 -> 7, so re-hash to current code
    assert out[advanced] == cat.definition_hash(cat._SPECS[advanced])
    # steady: green round unchanged, old hash carried over verbatim
    assert out[steady] == "b" * 16
