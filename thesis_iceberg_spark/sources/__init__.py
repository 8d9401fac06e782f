"""Sources & sinks (SURVEY.md §2A S1-S10)."""
