"""Engine helper functions (JVM-side expressions only — no Python UDFs)."""

from etl_manager_spark.functions.exact import dec, dec_avg, dec_sum

__all__ = ["dec", "dec_sum", "dec_avg"]
