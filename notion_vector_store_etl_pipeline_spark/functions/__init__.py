from notion_vector_store_etl_pipeline_spark.functions import strings, vectors, text

__all__ = ["strings", "vectors", "text"]
