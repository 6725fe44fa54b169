from raquet_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    executed_plan,
    has_broadcast_join,
    no_python_udfs,
    pushed_filter_columns,
    read_schema_columns,
)
