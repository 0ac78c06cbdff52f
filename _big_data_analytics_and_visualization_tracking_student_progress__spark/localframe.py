"""One-partition DataFrames for bounded driver-local control data.

`spark.createDataFrame(list, ...)` parallelizes the list across
`defaultParallelism` slices, so materializing a 1-row broadcast frame
(centroid tables, PQ codebooks, query-term fan-outs) or a collected
bounded result launches one Python-worker task PER CORE just to
serialize a handful of rows — measured 0.43 s vs 0.30 s per
materialization at local[32] (r14, OPTIMIZATION_r14.md).  Routing the
same rows through an explicit single-slice parallelize keeps the
DataFrame (schema, values, semantics) identical and runs one task.

Leaf module: imports nothing from the package, so any operator or
query module can use it without cycles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """`spark.createDataFrame(rows, schema)` for BOUNDED control data,
    in ONE partition.  ``rows`` is a list (or iterable) of
    Row/tuple/dict; ``schema`` a DDL string, StructType, or column-name
    list, exactly as `createDataFrame` accepts.  Empty input falls back
    to the stock path (an explicit schema is then required, as before).
    """
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
