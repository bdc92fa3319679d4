"""Git provenance for sweep artifacts (round-9 verdict #2).

An artifact claiming "N/N green" must provably describe a committed tree:
PARITY_SWEEP.json ran at 12:51 in round 9 while 5 of its 331 ops were
committed at 13:07/13:18, so the shipped file described no committed state.
Every sweep artifact now embeds the HEAD sha and a dirty flag, and the
sweep REFUSES a dirty tree unless explicitly overridden.

``PROGRESS.jsonl`` is excluded from dirtiness: the round driver appends to
it continuously between commits, and it carries no engine code.
"""

from __future__ import annotations

import subprocess
import sys

IGNORED = {"PROGRESS.jsonl"}


def git_state(repo: str) -> dict:
    """Return {"sha": <HEAD>, "dirty": bool, "dirty_files": [...]}."""
    # check=True (ADVICE r10): outside a worktree / on git failure a ''
    # sha with dirty=False would stamp vacuous-but-clean provenance on an
    # artifact; fail the sweep instead.
    sha = subprocess.run(
        ["git", "rev-parse", "HEAD"],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    if not sha:
        raise RuntimeError(f"git rev-parse returned no sha for {repo}")
    status = subprocess.run(
        ["git", "status", "--porcelain"],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.splitlines()
    dirty_files = sorted(
        {
            ln[3:].strip()
            for ln in status
            if ln.strip() and ln[3:].strip() not in IGNORED
        }
    )
    return {"sha": sha, "dirty": bool(dirty_files), "dirty_files": dirty_files}


def refuse_if_dirty(repo: str, allow_dirty: bool) -> dict:
    """git_state + hard stop when the tree is dirty (unless overridden)."""
    state = git_state(repo)
    if state["dirty"] and not allow_dirty:
        print(
            "REFUSING to sweep a dirty tree (artifact would describe no "
            f"committed state): {state['dirty_files'][:10]}\n"
            "Commit first, or pass --allow-dirty to record dirty=true.",
            file=sys.stderr,
        )
        raise SystemExit(2)
    if state["dirty"]:
        print(
            f"WARNING: sweeping dirty tree {state['dirty_files'][:10]}; "
            "artifact will record dirty=true",
            file=sys.stderr,
        )
    return state
