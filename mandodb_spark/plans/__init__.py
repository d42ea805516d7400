"""Plan inspection / assertion utilities (see plans.inspect)."""

from .inspect import (
    formatted_plan,
    has_node,
    physical_plan,
    pushed_filters,
    read_schemas,
    shuffle_count,
)

__all__ = [
    "formatted_plan",
    "has_node",
    "physical_plan",
    "pushed_filters",
    "read_schemas",
    "shuffle_count",
]
