"""Text-analysis operators over `documents` (north-star §2B). Filled in incrementally."""

from __future__ import annotations
