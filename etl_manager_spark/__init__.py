"""etl_manager_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of
``moj-analytical-services/etl_manager`` (reference: /root/reference),
re-targeted from AWS Glue/Athena onto Spark's own catalog, reader/writer
and SQL surface, plus first-class large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design notes
------------
The reference is a metadata manager + job orchestrator that *delegates* all
query execution to Athena / Glue-Spark (reference ``README.md:5-7``). This
package keeps its engine-agnostic metadata model (same JSON shape, same
recursive type grammar — reference ``etl_manager/utils.py:160-162``) but
executes natively: every declared capability is answered by a Spark
DataFrame/SQL primitive so Catalyst/Tungsten handle optimization (predicate
pushdown, column pruning, AQE join selection) with no custom rules.
"""

from etl_manager_spark.meta.types import (
    agnostic_to_spark_type,
    spark_type_to_agnostic,
    validate_agnostic_type,
)
from etl_manager_spark.meta.table import TableMeta
from etl_manager_spark.meta.database import DatabaseMeta
from etl_manager_spark.meta.io import (
    read_table_json,
    read_database_json,
    read_database_folder,
    tablemeta_from_parquet_schema,
)

__version__ = "0.1.0"

__all__ = [
    "TableMeta",
    "DatabaseMeta",
    "agnostic_to_spark_type",
    "spark_type_to_agnostic",
    "validate_agnostic_type",
    "read_table_json",
    "read_database_json",
    "read_database_folder",
    "tablemeta_from_parquet_schema",
]
