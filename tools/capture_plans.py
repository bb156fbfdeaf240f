"""Capture .explain('formatted') output for the bench workloads.

Writes plans/<tag>/<workload>_<suffix>.txt for each workload in the
decade-bench set (tools/bench_scale.py) plus the bench.py q5 ML-prep
pipeline. Plan capture is pure driver-side analysis — no job runs — so
it is safe to run on a loaded host; the files are the before/after
evidence for optimization rounds (spark_optimization_guide.md §1).

Usage: python tools/capture_plans.py <tag> <suffix> [workload ...]
e.g.   python tools/capture_plans.py r13 before
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def workloads(spark):
    import bench
    from tools import bench_scale
    from fraud_detection_project_spark.queries import QUERIES

    out = {
        "q1_pricing": lambda: QUERIES["pricing_summary"](spark, SF_DIR),
        "q2_geolocate": lambda: QUERIES["geolocate_events_value"](spark, SF_DIR),
        "q3_velocity": lambda: QUERIES["velocity_features_3keys"](spark, SF_DIR),
        "q4_cleaning": lambda: QUERIES["cleaning_chain"](spark, SF_DIR),
        "q5_ml_prep": lambda: bench.ml_prep_pipeline(spark, SF_DIR),
        "q3s_velocity_sliced": lambda: QUERIES["rolling_24h_user_sliced"](spark, SF_DIR),
        "q6_exact_dedup": lambda: QUERIES["exact_dedup_docs"](spark, SF_DIR),
        "q7_jaccard_cc": lambda: QUERIES["dup_clusters"](spark, SF_DIR),
        "q8_bm25": lambda: QUERIES["bm25_search_topk"](spark, SF_DIR),
        "q9_quantize": lambda: QUERIES["embedding_quantize_profile"](spark, SF_DIR),
        "q10_cdc_merge": lambda: QUERIES["cdc_merge_apply"](spark, SF_DIR),
        "q11_pagerank": lambda: QUERIES["doc_pagerank_topk"](spark, SF_DIR),
        "q12_cc_alone": lambda: bench_scale._cc_alone(spark, SF_DIR),
        "q13_sessionize": lambda: QUERIES["user_sessions_30m"](spark, SF_DIR),
        "q14_stream_join_twin": lambda: bench_scale._stream_join_batch_twin(spark, SF_DIR),
        "q15_global_index": lambda: QUERIES["global_index_events"](spark, SF_DIR),
        "q16_interval_overlap": lambda: QUERIES["interval_overlap_sessions"](spark, SF_DIR),
        "q17_boilerplate": lambda: QUERIES["boilerplate_removed_docs"](spark, SF_DIR),
        "q18_kcore_alone": lambda: bench_scale._kcore_alone(spark, SF_DIR),
        "q19_cms": lambda: QUERIES["cms_heavy_hitters"](spark, SF_DIR),
        "q20_transitions": lambda: QUERIES["event_transition_probs"](spark, SF_DIR),
        "q21_rouge2": lambda: bench_scale._rouge2_all_pairs(spark, SF_DIR),
        "q22_bootstrap": lambda: bench_scale._bootstrap_all(spark, SF_DIR),
        "q23_negatives": lambda: bench_scale._negatives_all(spark, SF_DIR),
    }
    return out


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    out_dir = os.path.join(ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from fraud_detection_project_spark.session import get_spark

    spark = get_spark("capture-plans")
    for name, build in workloads(spark).items():
        if only and name not in only:
            continue
        try:
            df = build()
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # a workload that needs an action to build
            plan = f"PLAN CAPTURE FAILED: {e!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
