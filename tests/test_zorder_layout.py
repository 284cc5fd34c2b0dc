"""Z-order layout: writing range-partitioned by the Morton key must
actually cluster BOTH dimensions — measured from the parquet column
min/max statistics a scan would prune with, not from the plan.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

import pyspark.sql.functions as F

from notion_vector_store_etl_pipeline_spark.plans import load_registry

SF = "/root/testdata/sf0.01"


def _file_spans(path: str, cols: tuple[str, str]) -> list[tuple[int, int]]:
    """Per data file: the (max-min) span of each stats column — the
    width of the range a zone-map prune has to assume the file covers."""
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for i, name in enumerate(names):
                if name not in cols:
                    continue
                st = md.row_group(rg).column(i).statistics
                lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        spans.append(tuple(hi[c] - lo[c] for c in cols))
    return spans


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    reg = load_registry()
    z = reg["zorder_layout"].fn(spark, SF)  # o_orderkey, x, y, zval, zbucket

    n_files = 16
    unsorted_path = str(tmp_path / "plain")
    zsorted_path = str(tmp_path / "zorder")
    z.repartition(n_files).write.parquet(unsorted_path)
    z.repartitionByRange(n_files, "zval").sortWithinPartitions("zval").write.parquet(
        zsorted_path
    )

    plain = _file_spans(unsorted_path, ("x", "y"))
    zord = _file_spans(zsorted_path, ("x", "y"))
    assert len(zord) == n_files

    # a random layout leaves every file spanning ~the full 0..255 range
    # in both dimensions; the z-order layout must shrink the average
    # per-file bounding box AREA by a large factor — that area ratio is
    # exactly the expected scan-pruning win for a predicate on x AND y
    area = lambda spans: sum((sx + 1) * (sy + 1) for sx, sy in spans) / len(spans)  # noqa: E731
    assert area(plain) > 200 * 200  # sanity: unsorted files span the space
    assert area(zord) < area(plain) / 4, (area(plain), area(zord))

    # single-dimension pruning also improves (x rides the high bits too)
    avg_span_x = lambda spans: sum(sx for sx, _ in spans) / len(spans)  # noqa: E731
    assert avg_span_x(zord) < avg_span_x(plain)

    # and the data survives the layout intact
    assert (
        spark.read.parquet(zsorted_path).agg(F.sum("o_orderkey")).first()[0]
        == z.agg(F.sum("o_orderkey")).first()[0]
    )
