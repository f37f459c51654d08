from .inspect import (  # noqa: F401
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    read_schemas,
    runtime_bloom_filter_count,
    shuffle_count,
    simple_plan,
    uses_take_ordered,
    wholestage_codegen_count,
)
