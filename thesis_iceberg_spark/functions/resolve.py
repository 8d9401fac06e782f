"""Deterministic semantic column matcher (SURVEY.md §2A P5, §7 step 8).

The reference asks an LLM for the semantically-closest column when a
requested name doesn't exist, with three outcomes: a column name,
"NO MATCH", or "AMBIGUOUS" (ref: api.py:380-423, outcome handling at
api.py:410-413).  This is the deterministic replacement: normalized-token
overlap + Levenshtein similarity, no network, reproducible, with the same
three outcomes.

This is pre-planning name resolution in Python (SURVEY.md §4: no Catalyst
rule needed) — it looks only at column NAMES, never data, so it costs
nothing at any scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

NO_MATCH = "NO_MATCH"
AMBIGUOUS = "AMBIGUOUS"
MATCH = "MATCH"

_SPLIT = re.compile(r"[^a-z0-9]+")


def _tokens(name: str) -> set[str]:
    return {t for t in _SPLIT.split(name.lower()) if t}


def _norm(name: str) -> str:
    return "".join(sorted(_SPLIT.split(name.lower()))).strip()


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _similarity(requested: str, candidate: str) -> float:
    """Blend of token containment, token-set Jaccard and normalized edit
    similarity in [0, 1].  Containment is the dominant term so that
    'Phone' -> 'Phone number' scores high (the reference's canonical rename,
    FIXTURES.md F1)."""
    rt, ct = _tokens(requested), _tokens(candidate)
    union = rt | ct
    jaccard = len(rt & ct) / len(union) if union else 0.0
    containment = len(rt & ct) / min(len(rt), len(ct)) if rt and ct else 0.0
    ra, ca = requested.lower().replace(" ", ""), candidate.lower().replace(" ", "")
    denom = max(len(ra), len(ca)) or 1
    edit = 1.0 - _levenshtein(ra, ca) / denom
    return 0.45 * containment + 0.25 * jaccard + 0.3 * edit


@dataclass(frozen=True)
class MatchResult:
    status: str  # MATCH | NO_MATCH | AMBIGUOUS
    column: str | None
    score: float
    candidates: tuple[str, ...] = ()


def match_column(
    requested: str,
    columns: list[str],
    threshold: float = 0.5,
    ambiguity_margin: float = 0.05,
) -> MatchResult:
    """Find the closest column to ``requested`` among ``columns``.

    Outcomes mirror the reference's LLM contract (api.py:410-413):
      * exact (case/punctuation-insensitive) name -> MATCH at score 1.0;
      * best score < threshold -> NO_MATCH;
      * two candidates within ``ambiguity_margin`` of the best -> AMBIGUOUS
        (candidates reported, deterministic order);
      * otherwise MATCH with the best-scoring column.
    """
    if not columns:
        return MatchResult(NO_MATCH, None, 0.0)
    exact = [c for c in columns if _norm(c) == _norm(requested)]
    if exact:
        return MatchResult(MATCH, sorted(exact)[0], 1.0)
    scored = sorted(
        ((c, _similarity(requested, c)) for c in columns),
        key=lambda cs: (-cs[1], cs[0]),
    )
    best_col, best = scored[0]
    if best < threshold:
        return MatchResult(NO_MATCH, None, best)
    near = tuple(c for c, s in scored if best - s <= ambiguity_margin)
    if len(near) > 1:
        return MatchResult(AMBIGUOUS, None, best, near)
    return MatchResult(MATCH, best_col, best)
