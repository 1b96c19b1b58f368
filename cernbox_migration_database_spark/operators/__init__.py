from .router import DECISIONS, route_shares, with_decision
from .enrich import lookup_join
from .merge import merge_updates, assert_exactly_one

__all__ = [
    "DECISIONS",
    "with_decision",
    "route_shares",
    "lookup_join",
    "merge_updates",
    "assert_exactly_one",
]
