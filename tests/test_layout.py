"""Z-order layout: Morton-code locality, prefix-pruned reads, and the
partition-pruning plan shape.  Value parity of `zorder_layout_stats` is
covered by test_oracle_parity; these pin the property the layout exists
for — 2-D data skipping."""

from __future__ import annotations

from pyspark.sql import functions as F

from _big_data_analytics_and_visualization_tracking_student_progress__spark.datasets import (
    load_table,
)
from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.layout import (
    zorder_code,
    zorder_prefixes,
    zorder_pruned_read,
    zorder_write,
)
from .conftest import SF_SMALL


def _orders_with_day(spark):
    return load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day"),
    )


def _ranges(df):
    r = df.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("day"), F.max("day")
    ).head()
    return (r[0], r[1]), (r[2], r[3])


class TestZorderLocality:
    def test_both_dimensions_narrow_per_file(self, spark):
        # top-8-bit z-cells are 16×16 blocks in 256×256 bucket space ⇒
        # each file's min/max range on EITHER dimension should span a
        # small fraction of the domain (a 1-D sort gives ~0 on one axis
        # and ~1 on the other; random gives ~1 on both)
        o = _orders_with_day(spark)
        xr, yr = _ranges(o)
        z = zorder_code(o, "o_custkey", "day", xr, yr, bits=8)
        stats = (
            z.groupBy(F.floor(F.col("__z") / F.lit(256)).alias("f"))
            .agg(
                (F.max("o_custkey") - F.min("o_custkey")).alias("xr"),
                (F.max("day") - F.min("day")).alias("yr"),
                F.count(F.lit(1)).alias("n"),
            )
            .filter(F.col("n") >= 5)
            .agg(F.avg("xr"), F.avg("yr"))
            .head()
        )
        x_frac = stats[0] / (xr[1] - xr[0])
        y_frac = stats[1] / (yr[1] - yr[0])
        assert x_frac < 0.15, x_frac
        assert y_frac < 0.15, y_frac


class TestZorderPrunedRead:
    def test_round_trip_equals_full_filter_and_prunes(self, spark, tmp_path):
        o = _orders_with_day(spark)
        xr, yr = _ranges(o)
        path = str(tmp_path / "zorders")
        zorder_write(
            o, path, "o_custkey", "day", xr, yr, bits=8, prefix_bits=4
        )

        # a selective 2-D box: middle eighth of each dimension
        xs = (
            xr[0] + (xr[1] - xr[0]) * 4 // 16,
            xr[0] + (xr[1] - xr[0]) * 6 // 16,
        )
        ys = (
            yr[0] + (yr[1] - yr[0]) * 4 // 16,
            yr[0] + (yr[1] - yr[0]) * 6 // 16,
        )
        pruned = zorder_pruned_read(
            spark, path, "o_custkey", "day", xs, ys, xr, yr,
            bits=8, prefix_bits=4,
        )
        expected = o.filter(
            (F.col("o_custkey") >= xs[0])
            & (F.col("o_custkey") <= xs[1])
            & (F.col("day") >= ys[0])
            & (F.col("day") <= ys[1])
        )
        got = {r.o_orderkey for r in pruned.collect()}
        want = {r.o_orderkey for r in expected.collect()}
        assert got == want
        assert want  # box is non-empty, the test is meaningful

        # the prefix manifest must actually prune: a centered 1/8 × 1/8
        # box intersects a strict minority of the 16 cells
        cand = zorder_prefixes(xs, ys, xr, yr, bits=8, prefix_bits=4)
        assert 0 < len(cand) < 16
        # and the IN-list lands in the scan's PartitionFilters (true
        # partition pruning — unmatched directories are never read;
        # inputFiles() reflects the pre-pruning listing, so assert on
        # the executed plan instead)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        import re

        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
        assert "__zp" in pf, plan


class TestQuantileBuckets:
    def test_balanced_under_skew_where_grid_collapses(self, spark):
        from pyspark.sql import functions as F

        from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.layout import (
            grid_bucket,
            quantile_bounds,
            quantile_bucket,
        )

        # heavy-tailed values: x = 2^(i mod 20) — the equal-width grid
        # dumps almost everything into bucket 0
        df = spark.range(4000).select(
            (F.pow(F.lit(2.0), (F.col("id") % 20).cast("double")))
            .cast("long")
            .alias("x")
        )
        bits = 4
        g = df.select(grid_bucket(F.col("x"), 1, 2 ** 19, bits=bits).alias("b"))
        top_grid = (
            g.groupBy("b").count().orderBy(F.col("count").desc()).head()[1]
        )
        assert top_grid > 0.5 * 4000  # grid collapsed

        bounds = quantile_bounds(df, "x", bits=bits)
        q = df.select(quantile_bucket(F.col("x"), bounds).alias("b"))
        counts = [r["count"] for r in q.groupBy("b").count().collect()]
        assert len(counts) >= (1 << bits) // 2  # most buckets populated
        assert max(counts) < 0.25 * 4000  # no collapsed bucket
