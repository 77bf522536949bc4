from doppel_spark.plans.inspect import (  # noqa: F401
    assert_no_row_python,
    physical_plan,
    plan_has,
)
