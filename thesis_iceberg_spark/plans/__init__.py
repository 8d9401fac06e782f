"""Plan-quality inspection (SURVEY.md §4 — keeping Catalyst's optimizations)."""

from thesis_iceberg_spark.plans.explain import (
    analyzed_plan,
    assert_broadcast_hints_only,
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_pruned,
    formatted_plan,
)

__all__ = [
    "analyzed_plan",
    "assert_broadcast_hints_only",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "formatted_plan",
]
