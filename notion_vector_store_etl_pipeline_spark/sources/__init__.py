from notion_vector_store_etl_pipeline_spark.sources.tables import TABLES, load_table, load_all

__all__ = ["TABLES", "load_table", "load_all"]
