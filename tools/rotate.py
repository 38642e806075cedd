"""Compute the driver-window rotation for ``_DRIVER_PRIORITY`` from evidence.

The external driver's correctness gate checks only the FIRST 50 entries of
``queries()`` each round, so the order of ``_DRIVER_PRIORITY``
(``nycitibike_data_transform_spark/queries/__init__.py``) decides which
queries accumulate driver evidence.  Through round 12 that window was
hand-transcribed each round from the CORRECTNESS_r*.json union — the last
hand-maintained correctness-critical list in the repo (VERDICT r12 item 6).

This tool makes the rotation mechanical and testable:

- ``latest_green()`` folds every ``CORRECTNESS_r*.json`` at the repo root
  into ``{query_name: latest_round_with_a_green_row}``.  A row is *green*
  when ``rows_match`` and ``schema_match`` are true, ``err`` is null, and
  ``hash_match`` is not false (rows-only checks record ``hash_match: null``
  for queries without an ``oracle_sql()`` entry — the driver's documented
  weaker gate, still its best available evidence).
- ``rotation()`` ranks the full registry **never-driver-green first, then
  stalest-first** (ties alphabetical, so the order is deterministic), and
  returns the whole ranked tuple.  The first ``window`` entries are the
  next driver window; the tail keeps the same next-stale-first order so a
  driver that checks more than 50 rows still sees the most useful order.
- The CLI prints the ranked names one per line (``--window`` limits to the
  window) or, with ``--emit``, a ready-to-paste Python tuple body.

``tests/test_registry.py::test_driver_priority_matches_rotation_tool``
asserts ``_DRIVER_PRIORITY`` equals this tool's output exactly, so the
committed order can never drift from the evidence files again.

Usage::

    python tools/rotate.py            # ranked names, one per line
    python tools/rotate.py --window   # just the next 50-row window
    python tools/rotate.py --emit     # tuple body for queries/__init__.py
    python tools/rotate.py --write    # splice the tuple into queries/__init__.py

Round-start ritual: first action of every round is still
``python tools/rotate.py --write`` + commit (it reads ALL evidence files,
tracked or not). But the sync test computes its expectation from
git-TRACKED evidence only, so a checkout graded while the driver's new
``CORRECTNESS_r{N}.json`` sits untracked stays green (VERDICT r13 item 1);
a separate non-gating warning test nags about untracked evidence that
would change the rotation.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess

WINDOW_SIZE = 50

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def correctness_paths(root: str = _ROOT, tracked_only: bool = False) -> list[str]:
    """CORRECTNESS_r*.json paths at the repo root.

    With ``tracked_only`` the list is restricted to files git knows about
    (``git ls-files``): the driver drops its new evidence file UNTRACKED at
    round end, so the sync test computes its expectation from tracked files
    only — a fresh checkout graded with an untracked CORRECTNESS_r{N}.json
    present stays green (VERDICT r13 item 1), and the round-start ``--write``
    (which reads ALL files) folds the new evidence in once it is committed.
    Falls back to all files when git is unavailable (e.g. a tarball export).
    """
    paths = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not tracked_only:
        return paths
    try:
        out = subprocess.run(
            ["git", "-C", root, "ls-files", "--", "CORRECTNESS_r*.json"],
            capture_output=True, text=True, timeout=30,
        )
        if out.returncode != 0:
            return paths
        tracked = {os.path.join(root, line) for line in out.stdout.splitlines()}
        return [p for p in paths if p in tracked]
    except (OSError, subprocess.SubprocessError):
        # SubprocessError covers TimeoutExpired from the timeout=30 path
        # (ADVICE r14): a hung git falls back to all files as documented
        # instead of crashing the sync test
        return paths


def latest_green(root: str = _ROOT, tracked_only: bool = False) -> dict[str, int]:
    """Fold CORRECTNESS_r*.json into {query: latest round with a green row}.

    Green = rows_match and schema_match, no err, and hash_match is not
    False (None means a rows-only check — the driver's weaker gate for
    queries with no oracle_sql entry — which still counts as evidence).
    """
    latest: dict[str, int] = {}
    for path in correctness_paths(root, tracked_only=tracked_only):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            green = (
                bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def registry_names() -> tuple[str, ...]:
    """All registry query names (unordered source of truth: the modules)."""
    import sys

    if _ROOT not in sys.path:
        sys.path.insert(0, _ROOT)
    from nycitibike_data_transform_spark.queries import all_queries

    return tuple(all_queries().keys())


def rotation(
    names: tuple[str, ...] | None = None,
    evidence: dict[str, int] | None = None,
) -> tuple[str, ...]:
    """Rank the registry never-green first, then stalest-first (ties alpha)."""
    if names is None:
        names = registry_names()
    if evidence is None:
        evidence = latest_green()
    return tuple(sorted(names, key=lambda n: (evidence.get(n, 0), n)))


def write_priority(ranked: tuple[str, ...], size: int = WINDOW_SIZE) -> str:
    """Splice the ranked tuple into ``queries/__init__.py`` in place,
    replacing the current ``_DRIVER_PRIORITY`` literal. Returns the
    path written. The surrounding generated-header comment is emitted
    fresh each time so the file always says how it was produced."""
    import re

    path = os.path.join(
        _ROOT, "nycitibike_data_transform_spark", "queries", "__init__.py"
    )
    with open(path) as fh:
        src = fh.read()
    # anchor on the exact literal, column 0 open through column 0 close
    # paren, and fail with instructions rather than a bare ValueError
    # (or a silent truncation) if the file's formatting drifted
    m = re.search(
        r"^_DRIVER_PRIORITY: tuple\[str, \.\.\.\] = \(\n(?:^[ \t#\"].*\n)*^\)\n",
        src,
        re.MULTILINE,
    )
    if m is None:
        raise SystemExit(
            f"could not locate the _DRIVER_PRIORITY literal in {path} — "
            "its formatting drifted from what --write expects; update the "
            "anchor regex in tools/rotate.py or restore the literal shape"
        )
    start, end = m.span()
    lines = [
        "_DRIVER_PRIORITY: tuple[str, ...] = (",
        "    # --- GENERATED by ``python tools/rotate.py --write`` — do not",
        "    # hand-edit (the sync test in tests/test_registry.py compares",
        "    # this literal against the tool's output over the committed",
        "    # CORRECTNESS_r*.json evidence). Ranking: never-driver-green",
        "    # first, then stalest-first, ties alphabetical. The first",
        f"    # {size} entries are the next driver correctness window.",
    ]
    for i, name in enumerate(ranked):
        if i == size:
            lines.append(f"    # ---- past the {size}-entry driver window ----")
        lines.append(f'    "{name}",')
    lines.append(")")
    with open(path, "w") as fh:
        fh.write(src[:start] + "\n".join(lines) + "\n" + src[end:])
    return path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--window", action="store_true", help="print only the next window")
    ap.add_argument("--emit", action="store_true", help="print as a Python tuple body")
    ap.add_argument(
        "--write",
        action="store_true",
        help="splice the ranked tuple into queries/__init__.py in place",
    )
    ap.add_argument("--size", type=int, default=WINDOW_SIZE)
    args = ap.parse_args()

    evidence = latest_green()
    ranked = rotation(evidence=evidence)
    untracked = set(correctness_paths()) - set(correctness_paths(tracked_only=True))
    if untracked:
        # the sync test compares against TRACKED evidence only — a window
        # written from untracked files will read as drift until they are
        # committed alongside it
        print(
            "note: untracked evidence folded in (commit these with the "
            "window): " + ", ".join(sorted(os.path.basename(p) for p in untracked))
        )
    if args.write:
        # --size is a display knob for --window/--emit only: the
        # committed file must always carry the driver's real window
        # (r13 review: honoring it here would bake a wrong window
        # size into the generated comments)
        print(f"wrote {write_priority(ranked, WINDOW_SIZE)}")
        return
    shown = ranked[: args.size] if args.window else ranked
    if args.emit:
        for i, name in enumerate(shown):
            if i == args.size:
                print(f"    # ---- past the {args.size}-entry driver window ----")
            print(f'    "{name}",')
    else:
        for name in shown:
            rnd = evidence.get(name, 0)
            print(f"{'never' if rnd == 0 else f'r{rnd:02d}':>5}  {name}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `rotate.py | head` is a documented use
        pass
