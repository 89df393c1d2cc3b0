from .inspect import assert_broadcast, assert_pushed_filters, formatted_plan

__all__ = ["assert_broadcast", "assert_pushed_filters", "formatted_plan"]
