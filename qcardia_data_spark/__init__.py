"""qcardia_data_spark — a PySpark-native analytics/data-pipeline engine.

A brand-new, idiomatic-Spark implementation of the query and data-processing
capabilities of the reference library q-cardIA/qcardia-data (a config-driven
ETL + data-pipeline library; see SURVEY.md for the full operator inventory),
extended with large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Design stance (SURVEY.md §7.0):
- DataFrame/SQL everywhere; Catalyst/AQE does the physical planning.
- No RDDs; Python touches data only through Arrow-vectorized pandas UDFs,
  and only where built-in functions genuinely cannot express the semantics.
- All "random" operators derive determinism from stable keys (md5 of key
  columns), never from partition iteration order — safe under task retry.
- No hidden operator state: invertible transforms carry explicit trace columns.
"""

from qcardia_data_spark.session import get_spark
from qcardia_data_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]
__version__ = "0.1.0"
