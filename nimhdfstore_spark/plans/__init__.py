from nimhdfstore_spark.plans.inspect import (  # noqa: F401
    executed_plan,
    has_broadcast,
    in_codegen,
    pushed_filters,
    read_schema,
)
