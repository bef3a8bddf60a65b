"""Job-runner behavior (reference GlueJob themes: resource discovery,
argument validation, cost timeout, typed failures — etl.py:45-743)."""

import os
import textwrap

import pytest

from etl_manager_spark.jobs import (
    JobFailed,
    JobTimedOut,
    SparkJob,
    cost_timeout_minutes,
)
from etl_manager_spark.jobs.runner import JobError


def make_job(tmp_path, body, name="myjob", with_resources=True):
    folder = tmp_path / name
    folder.mkdir()
    (folder / "job.py").write_text(textwrap.dedent(body))
    if with_resources:
        (folder / "py_resources").mkdir()
        (folder / "py_resources" / "helper_mod.py").write_text("VALUE = 41\n")
        (folder / "metadata").mkdir()
        (folder / "metadata" / "db.json").write_text("{}")
    return str(folder)


def test_cost_timeout_golden_values():
    # Golden values from the reference's own tests (test_tests.py:177-187):
    # $20 cap — 2×G.1X→1363 min; 5×G.2X (2 DPU)→272 min; 40×G.1X→68 min
    assert cost_timeout_minutes(20, 1, 2) == 1363
    assert cost_timeout_minutes(20, 2, 5) == 272
    assert cost_timeout_minutes(20, 1, 40) == 68


def test_run_job_with_injected_spark(tmp_path, spark):
    job = make_job(
        tmp_path,
        """
        import helper_mod
        assert metadata_base_path.endswith("metadata")
        df = spark.range(helper_mod.VALUE + 1)
        result = df.count()
        """,
    )
    j = SparkJob(job, job_arguments={"--limit": "42"})
    out = j.run(spark)
    assert out["result"] == 42
    assert j.job_run_state == "SUCCEEDED"


def test_job_failure_taxonomy(tmp_path, spark):
    j = SparkJob(make_job(tmp_path, "raise ValueError('boom')"))
    with pytest.raises(JobFailed, match="boom"):
        j.run(spark)
    assert j.job_run_state == "FAILED"


def test_job_timeout(tmp_path, spark):
    j = SparkJob(make_job(tmp_path, "import time\ntime.sleep(120)"))
    with pytest.raises(JobTimedOut):
        j.run(spark, timeout_minutes=0.02)  # ~1.2 s
    assert j.job_run_state == "TIMEOUT"


def test_job_cleanup_removes_temp_dir_and_sys_path(tmp_path, spark):
    """A31 analog (reference etl.py:719-743): cleanup() deletes the scratch
    dir exposed to the job as job_temp_path, strips lingering sys.path
    entries, resets to READY, and is idempotent."""
    import sys

    job = make_job(
        tmp_path,
        """
        import os
        with open(os.path.join(job_temp_path, "scratch.txt"), "w") as fh:
            fh.write("x")
        result = job_temp_path
        """,
    )
    j = SparkJob(job)
    out = j.run(spark)
    scratch = out["result"]
    assert os.path.isfile(os.path.join(scratch, "scratch.txt"))
    # simulate a zombie run's leftover path entry
    leftover = os.path.dirname(j.py_resources[0])
    sys.path.insert(0, leftover)
    j.cleanup()
    assert not os.path.exists(scratch)
    assert leftover not in sys.path
    assert j.job_run_state == "READY"
    j.cleanup()  # idempotent
    assert j.job_run_state == "READY"


def test_argument_validation(tmp_path):
    folder = make_job(tmp_path, "pass")
    with pytest.raises(JobError, match="reserved"):
        SparkJob(folder, job_arguments={"--metadata_base_path": "x"})
    with pytest.raises(JobError, match="starting with --"):
        SparkJob(folder, job_arguments={"limit": "1"})
    with pytest.raises(JobError, match="must be a string"):
        SparkJob(folder, job_arguments={"--limit": 5})


def test_missing_job_py(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(JobError, match="no job.py"):
        SparkJob(str(tmp_path / "empty"))


def test_shared_resource_merge_and_duplicate_rejection(tmp_path, spark):
    shared = tmp_path / "shared"
    (shared / "py_resources").mkdir(parents=True)
    (shared / "py_resources" / "shared_mod.py").write_text("SHARED = 'yes'\n")

    job = make_job(
        tmp_path,
        """
        import helper_mod, shared_mod
        result = (helper_mod.VALUE, shared_mod.SHARED)
        """,
    )
    j = SparkJob(job, shared_resources=str(shared))
    assert j.run(spark)["result"] == (41, "yes")

    # same basename in both folders → ambiguous → rejected
    (shared / "py_resources" / "helper_mod.py").write_text("VALUE = 0\n")
    with pytest.raises(JobError, match="duplicate resource"):
        SparkJob(job, shared_resources=str(shared))
