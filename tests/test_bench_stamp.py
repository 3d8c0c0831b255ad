"""Round detection for the full bench artifact (bench._detect_round):
the stamp must advance past COMMITTED CORRECTNESS rounds only — a
staged-but-uncommitted artifact is the driver mid-close and must keep
the current stamp (r8 ADVICE: `git ls-files` reflected the index and
mislabeled the closing round's artifact)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _detect_round  # noqa: E402


def _git(repo, *args):
    return subprocess.run(
        ["git", "-C", str(repo), *args],
        capture_output=True, text=True, check=True,
    ).stdout


def _make_repo(tmp_path):
    repo = tmp_path / "stamp_repo"
    repo.mkdir()
    _git(repo, "init", "-q")
    _git(repo, "config", "user.email", "t@t")
    _git(repo, "config", "user.name", "t")
    (repo / "seed.txt").write_text("seed\n")
    _git(repo, "add", "seed.txt")
    _git(repo, "commit", "-qm", "seed")
    return repo


def test_no_correctness_committed_uses_by_rows(tmp_path):
    repo = _make_repo(tmp_path)
    assert _detect_round(str(repo), 9) == 9


def test_older_committed_round_keeps_by_rows(tmp_path):
    repo = _make_repo(tmp_path)
    (repo / "CORRECTNESS_r08.json").write_text("{}\n")
    _git(repo, "add", "CORRECTNESS_r08.json")
    _git(repo, "commit", "-qm", "r8 artifact")
    assert _detect_round(str(repo), 9) == 9


def test_committed_current_round_advances_stamp(tmp_path):
    repo = _make_repo(tmp_path)
    (repo / "CORRECTNESS_r09.json").write_text("{}\n")
    _git(repo, "add", "CORRECTNESS_r09.json")
    _git(repo, "commit", "-qm", "r9 artifact")
    # round closed without a regen yet: the next bench belongs to r10
    assert _detect_round(str(repo), 9) == 10


def test_staged_uncommitted_artifact_does_not_advance(tmp_path):
    """The ADVICE case: `git add -A` mid-close stages the new
    CORRECTNESS file; the stamp must NOT advance until it is
    committed."""
    repo = _make_repo(tmp_path)
    (repo / "CORRECTNESS_r09.json").write_text("{}\n")
    _git(repo, "add", "CORRECTNESS_r09.json")  # staged, NOT committed
    assert _detect_round(str(repo), 9) == 9


def test_untracked_artifact_does_not_advance(tmp_path):
    repo = _make_repo(tmp_path)
    (repo / "CORRECTNESS_r09.json").write_text("{}\n")  # untracked
    assert _detect_round(str(repo), 9) == 9


def test_non_git_dir_falls_back_to_by_rows(tmp_path):
    plain = tmp_path / "plain"
    plain.mkdir()
    assert _detect_round(str(plain), 7) == 7
