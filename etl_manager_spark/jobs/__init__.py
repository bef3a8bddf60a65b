"""Job runner: folder-convention PySpark jobs with injected SparkSession."""

from etl_manager_spark.jobs.runner import (
    JobFailed,
    JobStopped,
    JobTimedOut,
    SparkJob,
    cost_timeout_minutes,
)

__all__ = ["SparkJob", "JobFailed", "JobTimedOut", "JobStopped", "cost_timeout_minutes"]
