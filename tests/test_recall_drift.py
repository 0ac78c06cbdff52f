"""Recall-drift telemetry for frozen-quantizer ANN indexes (VERDICT
r13 item 5): `cell_stats` skew shows when the quantizer's CELLS go
lopsided; `recall_probe_sample` shows when its ANSWERS go bad, and
`retrain_decision` pins the retrain trigger (probe-sample recall@k
below 0.9x the build-time baseline, or occupancy max/mean above 6x).
The 100x smoke (tools/scale_pq_index.py → SCALE.md) measures the same
pipeline at scale; this keeps the kernel honest at fixture size.
"""

from pyspark.sql import functions as F

from _big_data_analytics_and_visualization_tracking_student_progress__spark.datasets import (
    load_table,
)
from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators import (
    similarity as S,
)
from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.ann_index import (
    ManagedIvfIndex,
    ManagedPqIndex,
    recall_probe_sample,
    retrain_decision,
)

from .conftest import SF_SMALL

N_CELLS = 8


def _emb(spark):
    return load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def test_retrain_decision_is_the_pinned_trigger():
    assert not retrain_decision(0.95, 1.4)["retrain"]
    low = retrain_decision(0.62, 1.4)
    assert low["retrain"] and "recall" in low["reasons"][0]
    hot = retrain_decision(0.95, 7.2)
    assert hot["retrain"] and "skew" in hot["reasons"][0]
    # relative floor: 0.9x a build-time baseline
    assert retrain_decision(0.50, 1.0, recall_floor=0.9 * 0.52)["retrain"] is False
    assert retrain_decision(0.40, 1.0, recall_floor=0.9 * 0.52)["retrain"] is True
    # a missing signal is reported, never silently passed
    missing = retrain_decision(None, None)
    assert missing["retrain"] and len(missing["reasons"]) == 2


def test_recall_probe_sample_exact_at_full_nprobe(spark, tmp_path):
    """Probing EVERY cell of the raw tier is exact brute force, so
    recall@k must be exactly 1.0 — and recall is monotone in nprobe
    (more probed cells can only add exact candidates)."""
    emb = _emb(spark)
    cent = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=N_CELLS, iters=3
    )
    idx = ManagedIvfIndex(spark, str(tmp_path / "raw"), cent)
    idx.upsert(emb)
    qvs = [list(r["embedding"]) for r in emb.limit(3).collect()]
    full = recall_probe_sample(idx, emb, qvs, k=5, nprobe=N_CELLS)
    assert full == 1.0
    narrow = recall_probe_sample(idx, emb, qvs, k=5, nprobe=1)
    assert 0.0 <= narrow <= 1.0


def test_quantization_decay_and_shift_skew_trip_the_trigger(
    spark, tmp_path
):
    """Deterministic fixture-size drift signals (the composed
    baseline-clean → shift-trips regime is asserted at 100x inside
    tools/scale_pq_index.py, where the baseline recall is 100%; the
    near-uniform fixture vectors are PQ's worst case, so at 500 rows
    the PQ baseline is already floor-level and only the INDIVIDUAL
    signals are meaningful):

    - the raw tier probing every cell is exact → recall 1.0, so
      `recall_probe_sample` itself introduces no error;
    - the PQ tier on the SAME corpus and probe sample measures
      strictly lower — quantization decay is visible to the telemetry;
    - an off-manifold +3.0-offset append piles into few cells → the
      occupancy skew signal rises; and the PQ recall under the exact
      tier's 0.9 floor fires `retrain_decision`.
    """
    emb = _emb(spark)
    cent = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=N_CELLS, iters=3
    )
    books = S.train_pq_codebooks_portable(
        emb, "embedding", "vec_id", m=8, k=16, iters=3
    )
    raw = ManagedIvfIndex(spark, str(tmp_path / "raw"), cent)
    pq = ManagedPqIndex(spark, str(tmp_path / "pq"), cent, books)
    raw.upsert(emb)
    pq.upsert(emb)
    base_qvs = [list(r["embedding"]) for r in emb.limit(4).collect()]
    rb_raw = recall_probe_sample(raw, emb, base_qvs, k=10, nprobe=N_CELLS)
    rb_pq = recall_probe_sample(pq, emb, base_qvs, k=10, nprobe=N_CELLS)
    assert rb_raw == 1.0
    assert rb_pq < rb_raw

    skew_before = pq.cell_stats()["skew"]
    max_id = emb.agg(F.max("vec_id")).head()[0]
    shifted = emb.filter(F.col("vec_id") % 4 == 3).select(
        (F.col("vec_id") + max_id + 1).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x + F.lit(3.0)).alias(
            "embedding"
        ),
    )
    pq.upsert(shifted)
    skew_after = pq.cell_stats()["skew"]
    assert skew_after > skew_before, (skew_before, skew_after)

    live = emb.unionByName(shifted)
    shift_qvs = [list(r["embedding"]) for r in shifted.limit(4).collect()]
    rs = recall_probe_sample(pq, live, shift_qvs, k=10, nprobe=N_CELLS)
    dec = retrain_decision(rs, skew_after, recall_floor=0.9 * rb_raw)
    assert dec["retrain"], (rb_raw, rs, dec)
