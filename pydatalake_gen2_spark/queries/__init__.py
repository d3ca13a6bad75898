"""Query corpus — importing this package registers every declared QueryPair."""

from pydatalake_gen2_spark.queries import (  # noqa: F401
    aggregates,
    joins,
    projection,
    setops,
    sorts,
    windows,
)
