from airstrik_py_spark.oracle.exprs import (  # noqa: F401
    OBS_CTE,
    duck_bearing,
    duck_haversine,
)
