"""Engine facade: one object tying metadata, catalog, query surface, jobs,
and validation together — the user-facing replacement for the reference's
"metadata + Athena + Glue job" triad.

Typical use::

    from etl_manager_spark import read_database_folder
    from etl_manager_spark.engine import Engine

    engine = Engine(spark)
    db = read_database_folder("meta/db1/")
    engine.register(db)                       # catalog DDL + MSCK
    engine.sql("SELECT * FROM workforce.teams WHERE snapshot_year = 2024")
    engine.validate(db)                       # constraint reports
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

    from etl_manager_spark.meta.database import DatabaseMeta
    from etl_manager_spark.validation import ConstraintReport


class Engine:
    def __init__(self, spark: "SparkSession"):
        self.spark = spark

    def register(
        self,
        db: "DatabaseMeta",
        replace: bool = False,
        refresh_partitions: bool = True,
    ) -> None:
        """Create the database + external tables on the Spark catalog and
        discover on-disk partitions (the reference's create_glue_database +
        refresh_all_table_partitions, without the Athena round-trips)."""
        if replace:
            db.delete_database(self.spark)
        db.update_database(self.spark, update_tables_if_exist=replace)
        if refresh_partitions:
            db.refresh_all_table_partitions(self.spark)

    def sql(self, query: str) -> "DataFrame":
        """Full Spark SQL over registered tables — the capability the
        reference delegates to Athena (reference README.md:55)."""
        return self.spark.sql(query)

    def table(self, qualified_name: str) -> "DataFrame":
        return self.spark.table(qualified_name)

    def analyze(self, db: "DatabaseMeta", columns: bool = False) -> None:
        """Collect table (and optionally column) statistics for every table
        in the database — row counts and sizes for the optimizer, min/max/
        ndv per column when ``columns`` is set. At scale this is what turns
        Catalyst's cost-based join reordering and broadcast-threshold
        decisions from guesses into informed choices; re-run after large
        loads (the reference has no equivalent — Glue crawlers fill this
        role in its stack)."""
        for t in db.tables:
            suffix = " FOR ALL COLUMNS" if columns else ""
            self.spark.sql(
                f"ANALYZE TABLE {db.name}.{t.name} COMPUTE STATISTICS{suffix}"
            )

    def validate(self, db: "DatabaseMeta") -> dict[str, "ConstraintReport"]:
        """Constraint report per table (declared → enforced on demand)."""
        from etl_manager_spark.validation import validate

        return {t.name: validate(t.read(self.spark), t) for t in db.tables}

    def run_job(self, job_folder: str, **kwargs):
        """Execute a folder-convention job with this engine's session."""
        from etl_manager_spark.jobs import SparkJob

        run_kwargs = {}
        if "timeout_minutes" in kwargs:
            run_kwargs["timeout_minutes"] = kwargs.pop("timeout_minutes")
        return SparkJob(job_folder, **kwargs).run(self.spark, **run_kwargs)
