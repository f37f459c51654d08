from .inspect import (  # noqa: F401
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    read_schemas,
    shuffle_count,
    uses_take_ordered,
    wholestage_codegen_count,
)
