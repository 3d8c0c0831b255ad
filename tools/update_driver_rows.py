"""Regenerate plans/driver_rows.py from the driver's CORRECTNESS_r*.json.

The external driver re-checks only the FIRST ~50 entries of
``plans.catalog.CATALOG`` each round.  Instead of hand-rotating the dict
(which silently leaves new entries unverified if rotation lapses --
ADVICE r4), we record, per query, the last round in which the driver
produced a FULLY green row (rows+schema+hash all true).  The catalog
then orders itself stalest-first from this data, so:

  * never-checked / newly-added queries always land at the front,
  * rows-only ``no_oracle`` rows do NOT count as green (an upgraded
    oracle automatically re-queues the query),
  * freshly-verified queries rotate to the back on the next regen.

Since round 7 the sidecar also records GREEN_HASH: the definition hash
(builder source + oracle SQL, ``catalog.definition_hash``) captured
when an entry's green row ADVANCES.  The catalog re-computes the hash
at import and auto-ranks any mismatching entry stalest (sort key 0), so
an oracle-only or builder-only edit after a green row can never hide
behind it (the r6 ``equi_depth_bins`` gap).  Hashes for entries whose
green round did not advance are carried over verbatim -- re-hashing
them at regen time would launder a post-green edit into "verified".

Run after each round, BEFORE editing any query:
    python tools/update_driver_rows.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = (
    REPO
    / "delta_lake_gcp_implementation_spark"
    / "plans"
    / "driver_rows.py"
)


def collect() -> dict[str, int]:
    last_green: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        rows = json.loads(f.read_text())
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green


def engine_tree_matches_correctness_commit() -> tuple[bool, str]:
    """Bootstrap-laundering guard (r7 ADVICE): re-hashing an ADVANCED
    entry at regen time certifies the CURRENT working tree with a green
    row the driver produced at the round's final commit.  That is only
    sound when the engine sources are bit-identical to what the driver
    ran.  Returns (ok, detail): ok=False when the engine package
    changed (committed or uncommitted) since the commit that recorded
    the newest CORRECTNESS file."""
    import subprocess

    def _git(*args: str) -> str:
        return subprocess.run(
            ["git", "-C", str(REPO), *args],
            capture_output=True, text=True, check=True,
        ).stdout.strip()

    newest = max(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda f: int(re.search(r"r(\d+)", f.name).group(1)),
        default=None,
    )
    if newest is None:
        return True, "no CORRECTNESS file"
    paths = ["delta_lake_gcp_implementation_spark", "__spark_entry__.py"]
    try:
        base = _git("log", "-1", "--format=%H", "--", newest.name)
        if not base:
            # newest CORRECTNESS file exists but was never committed:
            # there is no commit to compare against, so fail CLOSED —
            # folding this into the git-unavailable path would launder
            # a post-edit working tree ('git log -1 -- <untracked>'
            # exits 0 with empty stdout).
            return False, f"{newest.name} is not committed; failing closed"
        committed = _git("diff", "--name-only", base, "HEAD", "--", *paths)
        dirty = _git("status", "--porcelain", "--", *paths)
    except Exception as exc:  # not a git checkout / git unavailable
        return True, f"git unavailable ({exc}); guard skipped"
    changed = [ln for ln in (committed + "\n" + dirty).splitlines() if ln]
    if changed:
        return False, (
            f"engine sources changed since {newest.name}'s commit "
            f"({base[:10]}): " + ", ".join(changed[:10])
        )
    return True, f"tree matches {newest.name}'s commit"


def collect_hashes(
    last_green: dict[str, int], allow_rehash: bool = True
) -> dict[str, str]:
    """GREEN_HASH for every catalog entry with a green row: re-hash
    when the green round advanced (or no hash was recorded), else carry
    the previously recorded hash over unchanged.  With
    ``allow_rehash=False`` (engine tree no longer matches what the
    driver verified), an advanced entry records the sentinel
    ``edited-post-green`` instead of a working-tree hash: the sentinel
    never equals a real definition hash, so the entry stays at the
    stale front and re-verifies on the next driver run -- conservative
    instead of laundering."""
    import sys

    sys.path.insert(0, str(REPO))
    from delta_lake_gcp_implementation_spark.plans import catalog as cat
    from delta_lake_gcp_implementation_spark.plans import driver_rows as old

    old_green: dict[str, int] = getattr(old, "LAST_GREEN", {})
    old_hash: dict[str, str] = getattr(old, "GREEN_HASH", {})
    out: dict[str, str] = {}
    for name, rnd in last_green.items():
        spec = cat._SPECS.get(name)
        if spec is None:  # retired catalog key; keep LAST_GREEN row only
            continue
        if name in old_hash and old_green.get(name, 0) >= rnd:
            out[name] = old_hash[name]
        elif allow_rehash:
            out[name] = cat.definition_hash(spec)
        else:
            out[name] = "edited-post-green"
    return out


def purge_retired(last_green: dict[str, int]) -> dict[str, int]:
    """Drop LAST_GREEN rows for keys no longer in the catalog (r9
    VERDICT: retired ``*_capped``/``*_tuned`` aliases survived two
    regens).  A retired key cannot be ranked or re-verified, so its
    row is pure noise."""
    import sys

    sys.path.insert(0, str(REPO))
    from delta_lake_gcp_implementation_spark.plans import catalog as cat

    kept = {k: v for k, v in last_green.items() if k in cat._SPECS}
    dropped = sorted(set(last_green) - set(kept))
    if dropped:
        print(f"purged retired keys: {', '.join(dropped)}")
    return kept


def assert_freshness(last_green: dict[str, int], max_age: int = 3) -> None:
    """Fail the regen when any catalog key's green row is older than
    ``newest_round - max_age`` (r9 VERDICT item 4): with a full window
    rotation this means a key silently fell out of the driver window
    for several consecutive rounds.  Never-verified keys are exempt --
    they sort to the window front automatically."""
    import sys

    sys.path.insert(0, str(REPO))
    from delta_lake_gcp_implementation_spark.plans import catalog as cat

    if not last_green:
        return
    newest = max(last_green.values())
    floor = newest - max_age
    stale = sorted(
        (rnd, name)
        for name, rnd in last_green.items()
        if name in cat._SPECS and rnd < floor
    )
    if stale:
        listing = ", ".join(f"{n} (r{r})" for r, n in stale)
        print(
            f"FRESHNESS VIOLATION: catalog keys with LAST_GREEN older "
            f"than r{floor} (newest r{newest} - {max_age}): {listing}",
            file=sys.stderr,
        )
        raise SystemExit(2)


def main() -> None:
    import sys

    last_green = purge_retired(collect())
    assert_freshness(last_green)
    clean, detail = engine_tree_matches_correctness_commit()
    if not clean:
        print(f"WARNING: {detail}", file=sys.stderr)
        print(
            "WARNING: advanced entries get the 'edited-post-green' "
            "sentinel (stay stale) instead of a working-tree hash; "
            "run the regen at round start, before editing, to record "
            "real hashes.",
            file=sys.stderr,
        )
    green_hash = collect_hashes(last_green, allow_rehash=clean)
    lines = [
        '"""GENERATED by tools/update_driver_rows.py -- do not edit.',
        "",
        "LAST_GREEN maps query name -> last round with a fully green",
        "driver CORRECTNESS row (rows+schema+hash); plans.catalog",
        "orders itself stalest-first from it.  GREEN_HASH maps query",
        "name -> definition hash (builder source + oracle SQL) captured",
        "when that green row landed; a mismatch vs the current code",
        "auto-ranks the entry stalest (post-green edits re-verify).",
        '"""',
        "",
        "LAST_GREEN: dict[str, int] = {",
    ]
    for name in sorted(last_green):
        lines.append(f'    "{name}": {last_green[name]},')
    lines.append("}")
    lines.append("")
    lines.append("GREEN_HASH: dict[str, str] = {")
    for name in sorted(green_hash):
        lines.append(f'    "{name}": "{green_hash[name]}",')
    lines.append("}")
    OUT.write_text("\n".join(lines) + "\n")
    print(
        f"wrote {OUT} ({len(last_green)} green entries, "
        f"{len(green_hash)} hashes)"
    )


if __name__ == "__main__":
    main()
