from notion_vector_store_etl_pipeline_spark.streaming.windows import stream_tumbling_counts
from notion_vector_store_etl_pipeline_spark.streaming.incremental_stream import (
    incremental_foreach_batch,
)

__all__ = ["stream_tumbling_counts", "incremental_foreach_batch"]
