"""celeborn_spark — a PySpark-native analytics engine.

A brand-new engine exposing, as idiomatic DataFrame/SQL operators, the
data-processing capabilities of Apache Celeborn's data plane (reference:
/root/reference, a remote shuffle service — see SURVEY.md) plus the
LLM-data-pipeline extension operators (dedup, similarity search,
multimodal columns, text analysis).

Design stance (SURVEY.md §3.4): Spark already *is* the query engine.
Celeborn's partition-by-key exchange / merged reads / map-side combine /
skew split / sorted range reads are reproduced by Spark's own shuffle +
AQE when the plan is declared with the DataFrame/SQL API. This package
contributes the tuned session factory, the typed operator surface, the
extension operators, and the oracle-checked query registry.
"""

from celeborn_spark.session import get_spark
from celeborn_spark.catalog import TABLES, load_tables, register_views
from celeborn_spark.registry import queries, oracles, query

__all__ = [
    "get_spark",
    "TABLES",
    "load_tables",
    "register_views",
    "queries",
    "oracles",
    "query",
]

__version__ = "0.1.0"
