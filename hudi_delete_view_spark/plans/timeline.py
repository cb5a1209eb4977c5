"""Commit timeline: ordered completed instants over ``.hoodie/``-style metadata.

Reference semantics rebuilt here:

- instant enumeration + unique-completed-instant selection
  (``DeleteView.java:51-55,196-204``) — driver-side listing of the metadata
  dir, lexicographic sort on fixed-width timestamps;
- per-timestamp commit-metadata memoization (``DeleteView.java:65,192-217``)
  via ``functools.lru_cache`` on the loader;
- explicit errors for a missing instant (the reference throws a bare
  ``NoSuchElementException`` at ``DeleteView.java:55``; we raise a described
  error instead, as its own predecessor check does at ``:124-125``).

Everything here is metadata-scale (one small JSON per commit); no Spark jobs.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from functools import lru_cache

from .metadata import CommitMetadata

META_DIR_NAME = ".hoodie"
COMMIT_SUFFIX = ".commit"
_TS_RE = re.compile(r"^(\d{14})\.commit$")


class TimelineError(ValueError):
    """Raised for missing instants / predecessors / malformed timelines."""


@dataclass(frozen=True)
class Instant:
    timestamp: str  # fixed-width yyyyMMddHHmmss, lexicographically ordered
    state: str  # "completed" (inflight files are never surfaced)
    path: str


class Timeline:
    """Ordered view of a table's completed commit instants."""

    def __init__(self, base_path: str):
        self.base_path = base_path
        self.meta_dir = os.path.join(base_path, META_DIR_NAME)
        # lru_cache per-instance: metadata memo-cache (reference A17)
        self._load_metadata = lru_cache(maxsize=256)(self._load_metadata_uncached)

    # -- listing ---------------------------------------------------------
    def instants(self) -> list[Instant]:
        if not os.path.isdir(self.meta_dir):
            return []
        out = []
        for name in sorted(os.listdir(self.meta_dir)):
            m = _TS_RE.match(name)
            if m:
                out.append(
                    Instant(m.group(1), "completed", os.path.join(self.meta_dir, name))
                )
        return out

    def timestamps(self) -> list[str]:
        return [i.timestamp for i in self.instants()]

    def latest_timestamp(self) -> str | None:
        ts = self.timestamps()
        return ts[-1] if ts else None

    # -- selection -------------------------------------------------------
    def instant_for(self, timestamp: str) -> Instant:
        """The unique completed instant with this exact timestamp."""
        for inst in self.instants():
            if inst.timestamp == timestamp:
                return inst
        raise TimelineError(
            f"no completed commit instant with timestamp {timestamp!r} in "
            f"{self.meta_dir} (have: {self.timestamps()})"
        )

    def commits_in_range(self, begin_exclusive: str | None, end_inclusive: str | None) -> list[Instant]:
        """Instants with begin < ts <= end (incremental-read bounds)."""
        out = []
        for inst in self.instants():
            if begin_exclusive is not None and inst.timestamp <= begin_exclusive:
                continue
            if end_inclusive is not None and inst.timestamp > end_inclusive:
                continue
            out.append(inst)
        return out

    # -- metadata --------------------------------------------------------
    def _load_metadata_uncached(self, timestamp: str) -> CommitMetadata:
        inst = self.instant_for(timestamp)
        with open(inst.path) as f:
            return CommitMetadata.from_json(f.read())

    def commit_metadata(self, timestamp: str) -> CommitMetadata:
        return self._load_metadata(timestamp)

    def refresh(self) -> None:
        """Drop the metadata memo-cache (reference A18's refresh, minus HTTP)."""
        self._load_metadata.cache_clear()
