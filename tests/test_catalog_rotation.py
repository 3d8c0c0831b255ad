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


def test_helper_only_edit_flags_all_extra_sources_callers():
    """r7 ADVICE (medium): builders that delegate their logic to a
    shared helper used to escape the staleness guard — only the
    builder's own source was hashed.  With ``extra_sources`` the
    helper's source is part of the definition payload, so an edit to
    the helper alone changes every caller's hash."""
    from delta_lake_gcp_implementation_spark.plans import textops as X

    callers = [
        n
        for n, s in cat._SPECS.items()
        if any(e is X._tuned_near_dup_pairs for e in s.extra_sources)
    ]
    # the two wrappers the ADVICE named must both be covered
    assert set(callers) >= {"semantic_dedup", "embedding_near_dups"}

    class _EditedHelper:
        """Stand-in whose 'source' differs from the real helper."""

    for name in callers:
        spec = cat._SPECS[name]
        h_now = cat.definition_hash(spec)
        edited = cat.QuerySpec(
            spec.builder,
            spec.oracle_sql,
            extra_sources=tuple(
                _EditedHelper if e is X._tuned_near_dup_pairs else e
                for e in spec.extra_sources
            ),
        )
        assert cat.definition_hash(edited) != h_now, name


def test_extra_sources_mismatch_ranks_caller_stalest():
    """End-to-end through ordered_catalog: recording the CURRENT hash
    as green, then simulating a helper edit via a different
    extra_sources payload, must pull the caller into the stale front
    group exactly like a builder edit."""
    name = "semantic_dedup"
    spec = cat._SPECS[name]
    edited_specs = dict(cat._SPECS)
    edited_specs[name] = cat.QuerySpec(
        spec.builder, spec.oracle_sql, extra_sources=()
    )
    gh = dict(dr.GREEN_HASH)
    gh[name] = cat.definition_hash(spec)  # green recorded at HEAD

    def stale_front(specs):
        """Names at sort key 0: FORCE_STALE or recorded-hash mismatch."""
        return {
            n
            for n, s in specs.items()
            if n in cat.FORCE_STALE
            or (gh.get(n) is not None and gh[n] != cat.definition_hash(s))
        }

    # with the hash recorded at HEAD the entry is NOT stale...
    assert name not in stale_front(cat._SPECS)
    # ...but the helper edit (different extra_sources payload) flags it
    assert name in stale_front(edited_specs)
    # and ordered_catalog puts every flagged entry ahead of green rows
    ordered = list(cat.ordered_catalog(specs=edited_specs, green_hash=gh))
    assert name in ordered[: len(stale_front(edited_specs))]


def test_regen_dirty_tree_records_sentinel_not_working_tree_hash(
    monkeypatch,
):
    """r7 ADVICE (low, bootstrap laundering): when the engine tree no
    longer matches the commit the driver verified, an ADVANCED entry
    must NOT have the current working tree hashed into GREEN_HASH —
    it records a sentinel that can never match, so it stays stale and
    re-verifies."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import update_driver_rows as reg

    name = next(iter(dr.GREEN_HASH))
    monkeypatch.setattr(dr, "GREEN_HASH", {})
    monkeypatch.setattr(dr, "LAST_GREEN", {})
    dirty = reg.collect_hashes({name: 8}, allow_rehash=False)
    assert dirty[name] == "edited-post-green"
    assert dirty[name] != cat.definition_hash(cat._SPECS[name])
    clean = reg.collect_hashes({name: 8}, allow_rehash=True)
    assert clean[name] == cat.definition_hash(cat._SPECS[name])


def test_engine_tree_guard_detects_current_state():
    """The guard reads git; at a commit where engine sources changed
    after the newest CORRECTNESS file landed it must say not-clean,
    and its detail must name the file.  (This repo edits engine code
    mid-round, so both outcomes are legitimate — assert consistency
    with git itself rather than a fixed answer.)"""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    import update_driver_rows as reg

    ok, detail = reg.engine_tree_matches_correctness_commit()
    import re

    newest = max(
        repo.glob("CORRECTNESS_r*.json"),
        key=lambda f: int(re.search(r"r(\d+)", f.name).group(1)),
    )
    base = subprocess.run(
        ["git", "-C", str(repo), "log", "-1", "--format=%H", "--",
         newest.name],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    if not base:
        # The newest CORRECTNESS file exists but was never committed —
        # the state the driver leaves at every round boundary.  The
        # guard must fail CLOSED and name the file; there is no commit
        # to diff against, so mirror that branch instead of running
        # `git diff '' HEAD`.
        assert ok is False
        assert newest.name in detail and "not committed" in detail
        return
    diff = subprocess.run(
        ["git", "-C", str(repo), "diff", "--name-only", base, "HEAD",
         "--", "delta_lake_gcp_implementation_spark", "__spark_entry__.py"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    status = subprocess.run(
        ["git", "-C", str(repo), "status", "--porcelain", "--",
         "delta_lake_gcp_implementation_spark", "__spark_entry__.py"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert ok == (not diff and not status)


def test_engine_tree_guard_fails_closed_on_uncommitted_correctness(
    monkeypatch, tmp_path
):
    """r8 review: `git log -1 -- <untracked>` exits 0 with EMPTY
    stdout, so an uncommitted newest CORRECTNESS file used to fall
    into the blanket except and return ok=True ('git unavailable') —
    laundering a post-edit tree.  It must fail CLOSED instead."""
    import subprocess
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import update_driver_rows as reg

    def git(*args):
        subprocess.run(
            ["git", "-C", str(tmp_path), "-c", "user.email=t@t",
             "-c", "user.name=t", *args],
            capture_output=True, text=True, check=True,
        )

    git("init", "-q")
    (tmp_path / "CORRECTNESS_r01.json").write_text("{}")
    git("add", "CORRECTNESS_r01.json")
    git("commit", "-q", "-m", "r1")
    # newest CORRECTNESS file present in the tree but NEVER committed
    (tmp_path / "CORRECTNESS_r02.json").write_text("{}")

    monkeypatch.setattr(reg, "REPO", tmp_path)
    ok, detail = reg.engine_tree_matches_correctness_commit()
    assert not ok
    assert "not committed" in detail


def test_purge_retired_drops_keys_absent_from_catalog():
    """r9 VERDICT: retired ``*_capped``/``*_tuned`` alias rows survived
    two regens because collect() carries every name any CORRECTNESS
    file ever greened.  purge_retired keeps only current catalog keys
    (and says which it dropped)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import update_driver_rows as reg

    live = next(iter(cat._SPECS))
    out = reg.purge_retired({live: 5, "retired_alias_xyz": 5})
    assert live in out
    assert "retired_alias_xyz" not in out


def test_assert_freshness_fails_on_stale_catalog_key():
    """r9 VERDICT item 4: a catalog key whose green row is older than
    newest-3 rounds fell out of the driver window silently; the regen
    must fail loudly with the offending list instead."""
    import sys
    from pathlib import Path

    import pytest

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import update_driver_rows as reg

    names = list(cat._SPECS)
    fresh, stale = names[0], names[1]
    # age gap of exactly max_age is tolerated (strict <)
    reg.assert_freshness({fresh: 9, stale: 6}, max_age=3)
    # one round older than the floor fails
    with pytest.raises(SystemExit):
        reg.assert_freshness({fresh: 9, stale: 5}, max_age=3)
    # never-in-catalog names are exempt (retired rows can't re-verify)
    reg.assert_freshness({fresh: 9, "retired_alias_xyz": 1}, max_age=3)
