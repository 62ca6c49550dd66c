"""tesseract_spark — a PySpark-native OLAP analytics engine.

A from-scratch reimplementation of the query and data-processing capabilities of
tesseract-olap/tesseract (reference, read-only at /root/reference) on Spark
SQL/DataFrames: the reference's SQL-string compiler becomes a DataFrame plan
builder and its ClickHouse backend becomes Catalyst + Tungsten.
"""

__version__ = "0.8.0"

from .fixtures import testdata_schema
from .plans.aggnav import AggregateNavigator
from .plans.builder import PlanBuilder
from .query.model import Query
from .schema.parse import schema_from_json
from .session import get_spark
from .sources.registry import TableRegistry, testdata_registry

__all__ = [
    "AggregateNavigator",
    "PlanBuilder",
    "Query",
    "TableRegistry",
    "get_spark",
    "schema_from_json",
    "testdata_registry",
    "testdata_schema",
]
