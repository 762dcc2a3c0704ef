"""bench.py .prev snapshot policy (round-11 ADVICE medium #2).

The single-snapshot-per-leg rule must preserve the round's CLEAN
first pass for round-agnostic artifact names (SCALING_sf*.json),
where the file already exists at round start as last round's
committed copy.  Policy under test: a file byte-identical to its
HEAD copy is never snapshotted (git preserves it), so the .prev slot
goes to the first uncommitted pass; close_round.sh prunes stale
.prev at chain start.
"""

from __future__ import annotations

import importlib
import os
import subprocess

import pytest


@pytest.fixture(scope="module")
def benchmod():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    return importlib.import_module("bench")


def _git(repo, *args):
    subprocess.run(
        ["git", "-C", str(repo), *args],
        check=True,
        capture_output=True,
        env={**os.environ, "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
             "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"},
    )


def test_matches_committed(benchmod, tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    _git(repo, "init", "-q")
    art = repo / "SCALING_sf1.json"
    art.write_text('{"value": 1}\n')
    _git(repo, "add", "SCALING_sf1.json")
    _git(repo, "commit", "-qm", "r11 artifact")

    here = str(repo)
    assert benchmod._matches_committed(here, str(art)) is True
    art.write_text('{"value": 2}\n')  # this round's clean pass
    assert benchmod._matches_committed(here, str(art)) is False
    assert benchmod._matches_committed(here, str(repo / "missing.json")) is False
    # Untracked file (the BENCH_FULL_rNN case at pass 1): never "committed".
    new = repo / "BENCH_FULL_r12.json"
    new.write_text("{}\n")
    assert benchmod._matches_committed(here, str(new)) is False


def test_snapshot_sequence_preserves_clean_pass(benchmod, tmp_path):
    """Simulate the full round sequence for a round-agnostic name:
    committed copy -> clean pass (no snapshot burned) -> gate rerun
    (clean pass snapshotted) -> second rerun (snapshot kept)."""
    repo = tmp_path / "repo"
    repo.mkdir()
    _git(repo, "init", "-q")
    art = repo / "SCALING_sf1.json"
    prev = repo / "SCALING_sf1.json.prev"
    art.write_text("committed-r11\n")
    _git(repo, "add", "SCALING_sf1.json")
    _git(repo, "commit", "-qm", "r11 artifact")
    here = str(repo)

    def write_pass(content):
        # The REAL snapshot block (extracted in round 13 so tests
        # exercise bench.py's code instead of a drift-prone mirror).
        benchmod._snapshot_before_overwrite(here, str(art))
        art.write_text(content)

    write_pass("clean-r12\n")          # pass 1: overwrites committed copy
    assert not prev.exists()           # slot NOT burned on the committed file
    write_pass("gate-rerun-1\n")       # driver gate rerun
    assert prev.read_text() == "clean-r12\n"   # clean pass preserved
    write_pass("gate-rerun-2\n")
    assert prev.read_text() == "clean-r12\n"   # still the clean pass
    assert art.read_text() == "gate-rerun-2\n"


def test_stale_prev_pruned_on_direct_bench_run(benchmod, tmp_path):
    """Round-12 ADVICE low #3: a stale .prev left by a prior aborted
    round (content == the base file's HEAD copy) must not block the
    one-snapshot guard when bench.py is run DIRECTLY (close_round.sh's
    chain-start prune never ran): pass 1 prunes the stale snapshot,
    pass 2 then preserves pass 1's clean numbers."""
    repo = tmp_path / "repo"
    repo.mkdir()
    _git(repo, "init", "-q")
    art = repo / "SCALING_sf1.json"
    prev = repo / "SCALING_sf1.json.prev"
    art.write_text("committed-r12\n")
    _git(repo, "add", "SCALING_sf1.json")
    _git(repo, "commit", "-qm", "r12 artifact")
    here = str(repo)

    # prior aborted round's leftover: snapshot of the committed copy
    prev.write_text("committed-r12\n")

    benchmod._snapshot_before_overwrite(here, str(art))
    art.write_text("clean-r13\n")      # pass 1 (direct bench.py run)
    assert not prev.exists()           # stale snapshot pruned, slot free
    benchmod._snapshot_before_overwrite(here, str(art))
    art.write_text("gate-rerun\n")     # pass 2
    assert prev.read_text() == "clean-r13\n"  # clean pass preserved

    # an IN-ROUND snapshot (differs from HEAD) is never pruned
    benchmod._snapshot_before_overwrite(here, str(art))
    assert prev.read_text() == "clean-r13\n"


def test_close_round_prune_keeps_inround_snapshot(tmp_path):
    """The chain-start prune (tools/close_round.sh) deletes only .prev
    files matching their base's HEAD copy; an in-round clean-pass
    snapshot (differs from HEAD — created by a mid-chain failure +
    re-run) must survive."""
    repo = tmp_path / "repo"
    repo.mkdir()
    _git(repo, "init", "-q")
    (repo / "SCALING_sf1.json").write_text("committed\n")
    _git(repo, "add", "SCALING_sf1.json")
    _git(repo, "commit", "-qm", "prior round")

    stale = repo / "SCALING_sf1.json.prev"
    stale.write_text("committed\n")           # last round's leftover
    live = repo / "BENCH_FULL_r12.json.prev"
    live.write_text("clean-pass\n")           # uncommitted in-round snapshot

    # the prune loop from tools/close_round.sh, verbatim semantics
    prune = r"""
    cd "$1"
    for prev in ./*.json.prev; do
      [ -e "$prev" ] || continue
      base=$(basename "${prev%.prev}")
      if git show "HEAD:${base}" 2>/dev/null | cmp -s - "$prev"; then
        rm -f "$prev"
      fi
    done
    """
    subprocess.run(["bash", "-c", prune, "-", str(repo)], check=True)
    assert not stale.exists()   # matched HEAD -> pruned
    assert live.exists()        # differs from HEAD (untracked base) -> kept
