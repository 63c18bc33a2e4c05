from airstrik_py_spark.sources import tables  # noqa: F401
