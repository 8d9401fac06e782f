"""Self-check queries for the versioned-table layer (SURVEY.md §2A T1-T8).

Time travel / snapshots / changelog have no DuckDB analogue, so these
register rows-only checks. Filled in with the tablefmt layer.
"""

from __future__ import annotations
