"""Micro-batch pacing shared by the four readStream CDC sources.

``maxCommitsPerTrigger`` bounds a batch by commit COUNT; that misses the
scale-failure mode where one giant commit blows up a micro-batch's
memory/shuffle. ``maxBytesPerTrigger`` (r8, VERDICT r6 #5) bounds the
batch by the SUM of the candidate commits' planned data-file bytes, at
commit granularity: commits are admitted oldest-first until the next one
would exceed the budget. The FIRST commit always admits (an oversized
single commit must still make progress — the same contract as Spark's
own file-source maxBytesPerTrigger, which is a soft cap).

Byte sizing is per-source, from commit METADATA only (Delta add.size,
Hudi write-stat fileSizeInBytes, Iceberg snapshot summary
added-files-size, Paimon manifest-entry _FILE_SIZE) — no file stats, no
data reads; a commit whose metadata carries no sizes counts 0
(best-effort, documented).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, TypeVar

C = TypeVar("C")


def read_pacing_options(options: dict) -> tuple[Optional[int], Optional[int]]:
    """-> (max_commits, max_bytes) from stream reader options (Python
    Data Source lowercases option keys; accept both spellings)."""
    raw_c = options.get("maxcommitspertrigger", options.get("maxCommitsPerTrigger"))
    raw_b = options.get("maxbytespertrigger", options.get("maxBytesPerTrigger"))
    return (
        int(raw_c) if raw_c is not None else None,
        int(raw_b) if raw_b is not None else None,
    )


_SIZER_CACHE_MAX = 8192


def memoized_sizer(cache: dict, fn: Callable[[C], int]) -> Callable[[C], int]:
    """Per-reader-instance byte-size memo: completed commits are immutable,
    but ``latestOffset`` fires every trigger and re-sizes the whole
    backlog — without this, each micro-batch plan re-decodes O(backlog)
    commit JSON / manifest lists (ADVICE r8). Entries for commits the
    stream has passed are never probed again, so the cache is cleared at
    a size cap rather than evicted per-key — a long-lived continuous
    reader stays bounded, and the rare post-clear re-size is one metadata
    decode."""

    def _sized(c: C) -> int:
        if c not in cache:
            if len(cache) >= _SIZER_CACHE_MAX:
                cache.clear()
            cache[c] = fn(c)
        return cache[c]

    return _sized


def paced_head(
    ahead: Sequence[C],
    commit_bytes: Callable[[C], int],
    max_commits: Optional[int],
    max_bytes: Optional[int],
) -> Optional[C]:
    """The farthest commit of the ordered backlog ``ahead`` that fits the
    commit and byte budgets; None when the backlog is empty. The first
    commit always fits."""
    if not ahead:
        return None
    if max_commits is None and max_bytes is None:
        return ahead[-1]
    chosen: Optional[C] = None
    spent = 0
    for i, c in enumerate(ahead):
        if max_commits is not None and i >= max_commits:
            break
        b = commit_bytes(c) if max_bytes is not None else 0
        if i > 0 and max_bytes is not None and spent + b > max_bytes:
            break
        chosen = c
        spent += b
    return chosen
