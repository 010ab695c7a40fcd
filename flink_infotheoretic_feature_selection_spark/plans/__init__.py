from flink_infotheoretic_feature_selection_spark.plans.inspect import (
    broadcast_join_count,
    exchange_count,
    formatted_plan,
    pushed_filters,
    round_robin_exchange_count,
    read_schema_columns,
    wholestage_codegen_count,
)

__all__ = [
    "broadcast_join_count",
    "exchange_count",
    "formatted_plan",
    "pushed_filters",
    "round_robin_exchange_count",
    "read_schema_columns",
    "wholestage_codegen_count",
]
