"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference streaming student-progress pipeline
(huynhchau25202/-BIG-DATA-ANALYTICS-AND-VISUALIZATION-TRACKING-STUDENT-PROGRESS.),
re-expressed Spark-first.

The reference composes Kafka + Elasticsearch + pandas + Streamlit
(reference src/pro.py, src/con.py, src/app.py).  This engine expresses the
same capabilities — streaming CDC ingest, keyed upsert, relational
analytics, dashboard aggregations — as declarative Spark DataFrame / SQL
plans optimized by Catalyst, plus the large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
the 100 TB north star requires.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .datasets import TABLES, load_table, load_tables  # noqa: F401
