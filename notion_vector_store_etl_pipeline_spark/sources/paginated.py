"""Custom paginated data source (Spark 4 Python DataSource API) — the
reference's cursor-pagination loops (`Notion_openai_vector_etl.py:
446-456, 458-465, 470-475, 538-596`: `while has_more` over page_size=100
API responses) re-expressed the Spark way: every page is an
InputPartition, so the "pagination loop" becomes a parallel partitioned
scan planned by the engine (SURVEY.md §2.1 S1-S3, §2.5 X2).

Here the "API" is backed by a parquet file (the fixtures stand in for
the remote workspace); a real connector would issue the cursor fetch
inside ``read()`` on the executor — same partition planning, same
schema contract, the transport is the only thing that changes. Rate
limiting then lives per-partition (bounded concurrent pages), which is
exactly how the reference throttles (sequential pages, `:652-653`) but
parallel across executors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGE_SIZE = 100  # the reference's page_size=100 everywhere


@dataclass
class PagePartition(InputPartition):
    path: str
    start: int
    end: int  # exclusive


class PaginatedReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if self.path is None:
            raise ValueError("paginated source requires .option('path', ...)")
        self.page_size = int(options.get("page_size", PAGE_SIZE))

    def partitions(self):
        import pyarrow.parquet as pq

        n_rows = pq.ParquetFile(self.path).metadata.num_rows
        return [
            PagePartition(self.path, start, min(start + self.page_size, n_rows))
            for start in range(0, n_rows, self.page_size)
        ]

    def read(self, partition: PagePartition):
        # executor-side "page fetch": a real connector would call the
        # remote API with this partition's cursor here. Only the row
        # groups overlapping this page are decoded — per-page cost is
        # proportional to the page, not the file.
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        offset = 0
        for rg in range(pf.metadata.num_row_groups):
            n = pf.metadata.row_group(rg).num_rows
            lo, hi = offset, offset + n
            offset = hi
            if hi <= partition.start or lo >= partition.end:
                continue
            table = pf.read_row_group(rg)
            s = max(partition.start - lo, 0)
            e = min(partition.end - lo, n)
            for batch in table.slice(s, e - s).to_batches():
                for row in batch.to_pylist():
                    yield tuple(row.values())


class PaginatedSource(DataSource):
    """spark.read.format("paginated").option("path", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "paginated"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(pq.ParquetFile(self.options["path"]).schema_arrow)

    def reader(self, schema) -> PaginatedReader:
        return PaginatedReader(self.options)


def register_paginated_source(spark) -> None:
    spark.dataSource.register(PaginatedSource)
