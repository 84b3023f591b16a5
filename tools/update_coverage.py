"""Regenerate the committed coverage manifest the query registry
orders itself by.

The registry's 50-cap ordering (see ``a2b_spark/queries/__init__.py``)
is part of the external driver contract, so it must be reproducible
from COMMITTED state alone — scanning the repo root at import time let
stray or partial local ``CORRECTNESS_r*.json`` files silently reorder
the capped prefix (round-4 advice). This tool snapshots the per-query
driver-green-round counts from the git-TRACKED correctness files into
``a2b_spark/queries/coverage.json``; the registry reads only that file.

Run after each round's CORRECTNESS_r{N}.json is committed:

    python tools/update_coverage.py && git add a2b_spark/queries/coverage.json

``tests/test_registry.py`` fails if the manifest is stale relative to
the tracked correctness files, so forgetting this step is loud.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tracked_correctness_files() -> list[str]:
    out = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    return sorted(out)


def green_rounds(sources: list[str]) -> dict[str, int]:
    """Per-query count of driver-green rounds. Green = value-hash
    match; for queries the harness checks weakly (no hash key),
    rows_match alone counts.

    Content comes from the COMMITTED blobs (`git show HEAD:<fn>`), not
    the working tree: the manifest's contract is 'reproducible from
    committed state alone', and a locally corrupted/half-written
    CORRECTNESS file would otherwise silently reorder the 50-cap
    prefix — the freshness test regenerates from the same source, so
    it could never catch working-tree drift."""
    cov: dict[str, int] = {}
    for fn in sources:
        blob = subprocess.run(
            ["git", "show", f"HEAD:{fn}"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        rounds = json.loads(blob)
        for q, res in rounds.items():
            if res.get("hash_match") is True or (
                "hash_match" not in res and res.get("rows_match")
            ):
                cov[q] = cov.get(q, 0) + 1
    return cov


def build_manifest() -> dict:
    sources = tracked_correctness_files()
    return {"sources": sources, "green_rounds": green_rounds(sources)}


def main() -> int:
    manifest = build_manifest()
    path = os.path.join(REPO, "a2b_spark", "queries", "coverage.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"wrote {path}: {len(manifest['sources'])} rounds, "
        f"{len(manifest['green_rounds'])} queries"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
