"""Plan-level strategy helpers: cost-based choices the engine makes
BEFORE handing the logical plan to Catalyst (join strategy selection,
skew diagnosis consumers). Catalyst + AQE already pick physical
operators well when statistics exist; this package covers the
decisions that need out-of-band profiling (sampled key skew, dim
cardinality vs broadcast budget) or rewrites Catalyst won't do on its
own (salting, manual Bloom pre-filters)."""

from pyanamo_spark.plans.joiner import JoinDecision, join_auto

__all__ = ["JoinDecision", "join_auto"]
