from gads_etl_spark.functions.numeric import money, rate, qty, dsum, davg  # noqa: F401
