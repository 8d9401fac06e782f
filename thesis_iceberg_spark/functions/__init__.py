"""Engine-level helper functions (name resolution, matching)."""
