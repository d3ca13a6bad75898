"""Query corpus — importing this package registers every declared QueryPair."""

from pydatalake_gen2_spark.queries import (  # noqa: F401
    aggregates,
    composite,
    functions,
    functions_ext,
    joins,
    llm,
    multimodal_q,
    projection,
    scans,
    textops,
    udfs,
    setops,
    sorts,
    streaming_batch,
    windows,
)
