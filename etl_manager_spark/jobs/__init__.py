"""Job runner: folder-convention PySpark jobs with injected SparkSession."""

from etl_manager_spark.jobs.runner import (
    JobError,
    JobFailed,
    JobMisconfigured,
    JobNotStarted,
    JobStopped,
    JobTimedOut,
    SparkJob,
    cost_timeout_minutes,
)

__all__ = [
    "SparkJob",
    "JobError",
    "JobMisconfigured",
    "JobNotStarted",
    "JobFailed",
    "JobTimedOut",
    "JobStopped",
    "cost_timeout_minutes",
]
