from airstrik_py_spark.functions import geo, text, vector  # noqa: F401
