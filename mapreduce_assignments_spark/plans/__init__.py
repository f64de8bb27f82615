from .rpn import BooleanQueryPlanner, rpn_to_sql

__all__ = ["BooleanQueryPlanner", "rpn_to_sql"]
