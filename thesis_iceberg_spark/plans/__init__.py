"""Plan-quality inspection (SURVEY.md §4 — keeping Catalyst's optimizations)."""

from thesis_iceberg_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_pruned,
    formatted_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "formatted_plan",
]
