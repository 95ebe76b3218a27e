"""Scratch-dir management for catalog queries that materialize
artifacts (lake round-trips, index builds, streaming checkpoints).

Two lifetimes, both cleaned at interpreter exit so repeated bench /
correctness runs in one process never leak disk:

- ``fresh_dir(prefix)`` — a new dir per call, for artifacts whose
  semantics REQUIRE freshness (streaming checkpoints: a reused
  checkpoint would mark the source already-processed and the drain
  would emit nothing; write-path round-trips where the write itself is
  the operator under test).
- ``cached_dir(label, sf_dir)`` — one dir per (label, scale factor),
  for expensive deterministic builds (IVF k-means, PQ codebooks): the
  first invocation builds, later invocations in the same process reuse
  the artifact — the deployment shape those queries model is
  build-once-probe-many anyway. The caller owns the "is it built yet"
  marker via ``mark_built`` / the returned ``built`` flag, so a crash
  mid-build never leaves a half-artifact that later calls trust.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ALL_DIRS: list[str] = []
_CACHED: dict[tuple[str, str], str] = {}
_MARKER = "_ARTIFACT_COMPLETE"


def fresh_dir(prefix: str) -> str:
    path = tempfile.mkdtemp(prefix=f"{prefix}_")
    _ALL_DIRS.append(path)
    return path


def cached_dir(label: str, sf_dir: str) -> tuple[str, bool]:
    """Returns ``(path, built)`` — ``built`` is True when a prior call
    completed the artifact (marked via :func:`mark_built`)."""
    key = (label, os.path.abspath(sf_dir))
    if key not in _CACHED:
        _CACHED[key] = fresh_dir(label)
    path = _CACHED[key]
    return path, os.path.exists(os.path.join(path, _MARKER))


def mark_built(path: str) -> None:
    with open(os.path.join(path, _MARKER), "w") as f:
        f.write("ok\n")


@atexit.register
def _cleanup() -> None:
    for d in _ALL_DIRS:
        shutil.rmtree(d, ignore_errors=True)
