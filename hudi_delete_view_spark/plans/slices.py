"""File-slice resolution: which physical files form the table at time T.

A *file group* is a logical row bucket keyed by ``file_id``; each commit that
touches it writes a new *file slice* that replaces the previous one
(reference model: ``DeleteView.java:112-142``). Snapshot/time-travel reads
resolve, per file group, the slice with the largest commit timestamp <= T —
pure driver-side metadata work over the commit timeline; the resulting path
list feeds one ``spark.read.parquet(*paths)``.

MOR: a file group additionally accumulates *log slices* after its base
slice; the reader unions them and merges latest-per-key (see
``sources/mor.py``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from .timeline import Timeline


@dataclass
class FileSlice:
    partition: str
    file_id: str
    commit_ts: str  # commit that wrote the base file
    base_path: str  # absolute path of the base parquet file
    log_paths: list[str] = field(default_factory=list)  # MOR delta logs (commit order)
    log_commits: list[str] = field(default_factory=list)


def resolve_slices(timeline: Timeline, as_of: str | None = None) -> dict[tuple[str, str], FileSlice]:
    """Latest slice per (partition, file_id) as of ``as_of`` (default: latest).

    Replays completed commits in timestamp order, keeping the last base file
    per file group and accumulating any newer log files on top of it.
    Compaction commits write fresh base files, which naturally clear the
    accumulated logs here.

    A commit published with ``extra.replacesAllFileGroups`` (partition
    evolution's repartition commit — the Hudi replacecommit analogue)
    resets the accumulated state before its own stats apply: every older
    file group is superseded by the new layout. Replays that stop BEFORE
    such a commit (time travel) never see the reset, so old commits stay
    readable under the old layout as long as their files survive clean().
    """
    from .timeline import TimelineError

    slices: dict[tuple[str, str], FileSlice] = {}
    cp = timeline.archive_checkpoint()
    if cp is not None:
        boundary = cp["as_of"]
        if as_of is not None and as_of < boundary:
            raise TimelineError(
                f"time travel to {as_of!r} precedes the archive boundary "
                f"{boundary!r}: slice state before the boundary is archived"
            )
        # seed from the checkpoint: resolution replays only the ACTIVE
        # tail — the scalability point of archival (bounded listing +
        # bounded replay regardless of total commit count)
        for d in cp["slices"]:
            s = FileSlice(
                partition=d["partition"],
                file_id=d["file_id"],
                commit_ts=d["commit_ts"],
                base_path=os.path.join(timeline.base_path, d["base_path"])
                if d["base_path"]
                else "",
                log_paths=[
                    os.path.join(timeline.base_path, p) for p in d["log_paths"]
                ],
                log_commits=list(d["log_commits"]),
            )
            slices[(s.partition, s.file_id)] = s
    for inst in timeline.instants():
        if as_of is not None and inst.timestamp > as_of:
            break
        meta = timeline.commit_metadata(inst.timestamp)
        if (meta.extra or {}).get("replacesAllFileGroups"):
            slices = {}
        for partition, stat in meta.all_stats():
            key = (partition, stat.file_id)
            abs_path = os.path.join(timeline.base_path, stat.path)
            if stat.log_file:
                sl = slices.get(key)
                if sl is None:
                    # log without a base file: first write to this group was
                    # a delta commit — model it as a log-only slice
                    sl = FileSlice(partition, stat.file_id, inst.timestamp, base_path="")
                    slices[key] = sl
                sl.log_paths.append(abs_path)
                sl.log_commits.append(inst.timestamp)
            else:
                slices[key] = FileSlice(
                    partition, stat.file_id, inst.timestamp, abs_path
                )
    return slices


def touched_file_groups(timeline: Timeline, begin_exclusive: str | None, end_inclusive: str | None) -> set[tuple[str, str]]:
    """(partition, file_id) groups written to in (begin, end] — incremental
    read prunes its scan to these groups before any data is read (the Spark
    analogue of the reference's stats-based pruning, ``DeleteView.java:100``)."""
    groups: set[tuple[str, str]] = set()
    for inst in timeline.commits_in_range(begin_exclusive, end_inclusive):
        meta = timeline.commit_metadata(inst.timestamp)
        for partition, stat in meta.all_stats():
            groups.add((partition, stat.file_id))
    return groups
