"""pydatalake_gen2_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capability surface declared in SURVEY.md §2B: relational operators
(scan/filter/join/agg/window/setop), a scalar-function surface, streaming
over an events table, and LLM-data-pipeline operators (dedup, similarity
search, multimodal plumbing, text analysis), plus a small lake-catalog
utility replacing the reference's ADLS Gen2 REST client
(reference: /root/reference/azure/datalake/gen2/client.py).

Layout:
    session.py    SparkSession factory (AQE on, UTC, oracle-safe confs)
    tables.py     explicit StructType schemas + fixture loading/views
    registry.py   query-pair registry (Spark callable + DuckDB oracle SQL)
    queries/      the declared operator corpus, one module per §2B family
    operators/    real engine code: asof join, dedup, similarity, text
    sources/      lake catalog (Hadoop FileSystem) + multimodal binary source
    streaming/    Structured Streaming replay + windowed aggregations
"""

from pydatalake_gen2_spark.session import get_spark
from pydatalake_gen2_spark.tables import TABLES, load_table, register_views


def open_lake(sf_dir: str, **kw):
    """Convenience: ``pydatalake_gen2_spark.open_lake(dir)`` → an Engine
    attached to a local parquet directory (see engine.Engine for the
    abfss:// path)."""
    from pydatalake_gen2_spark.engine import Engine

    return Engine.local(sf_dir, **kw)


__all__ = ["get_spark", "TABLES", "load_table", "register_views", "open_lake"]
