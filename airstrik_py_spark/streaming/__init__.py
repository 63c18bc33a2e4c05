from airstrik_py_spark.streaming import pipeline  # noqa: F401
