"""Plan inspection / assertion utilities (see plans.inspect)."""

from .inspect import (
    formatted_plan,
    has_node,
    note_iteration,
    physical_plan,
    pushed_filters,
    read_schemas,
    record_iterations,
    shuffle_count,
)

__all__ = [
    "formatted_plan",
    "has_node",
    "note_iteration",
    "physical_plan",
    "pushed_filters",
    "read_schemas",
    "record_iterations",
    "shuffle_count",
]
