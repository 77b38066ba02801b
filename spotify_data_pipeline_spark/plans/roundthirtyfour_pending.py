"""Round-31+ staging area (round-11 wave) — placeholder module; queries
are authored incrementally this round and activated via plans.active.

Per-wave staging module (nothing evidenced imports this file).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


PENDING: tuple[PendingQuery, ...] = ()
