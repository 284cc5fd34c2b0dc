"""Streaming wrapper for the incremental-state engine (SURVEY.md §2.10):
the reference's per-file manifest checkpoint (`:731`) becomes a
per-microbatch `foreachBatch` commit — same resume guarantee, batch
failure granularity. Checkpointing is Spark's, so an interrupted run
resumes from the last committed batch (the reference's
"Interrupted Run → Resumes", README.md:458-466).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from notion_vector_store_etl_pipeline_spark.operators.incremental import (
    plan_increment,
    upsert_state,
)


def incremental_foreach_batch(
    snapshot_stream: DataFrame,
    load_state: Callable[[], DataFrame],
    commit: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Run the incremental plan on each microbatch of snapshot rows.

    ``load_state`` returns the current state table; ``commit`` receives
    the next state and the batch id and must persist it atomically.
    """

    def _process(batch: DataFrame, batch_id: int) -> None:
        state = load_state()
        plan = plan_increment(batch, state)
        processed = plan.to_process.select(
            "block_id",
            batch["let"].alias("prior_let"),
            batch["content_hash"].alias("prior_hash"),
            plan.to_process["vector_file_ids"],
        )
        commit(upsert_state(state, processed), batch_id)

    return (
        snapshot_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
