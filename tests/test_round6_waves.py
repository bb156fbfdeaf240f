"""Property tests for the round-6 statistics / layout / sampling waves.

Each test pits the registered query's core kernel against an
independent brute-force implementation on small data — the same
strategy `tests/test_properties.py` uses for the window and as-of
operators.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fraud_detection_project_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _brute_tau_b(pairs):
    """Textbook O(n^2) Kendall tau-b over (x, y) tuples."""
    n = len(pairs)
    conc = disc = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pairs[i][0] - pairs[j][0]
            dy = pairs[i][1] - pairs[j][1]
            if dx == 0 and dy == 0:
                continue
            if dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                conc += 1
            else:
                disc += 1
    n0 = n * (n - 1) / 2
    # ties-in-both pairs count toward NEITHER n1-only nor n2-only in
    # tau-b's denominator terms; reconstruct n1/n2 from pair classes:
    # n0 - n1 = conc + disc + ty ; n0 - n2 = conc + disc + tx
    return (conc - disc) / math.sqrt((conc + disc + ty) * (conc + disc + tx))


def test_kendall_tau_matches_bruteforce(spark):
    row = QUERIES["kendall_tau_hour_value"](spark, SF).collect()[0]
    from fraud_detection_project_spark.catalog import load_table

    pdf = (
        load_table(spark, SF, "events")
        .select(
            F.hour("ts").alias("x"),
            F.least(F.lit(9), F.floor(F.col("value") / 50.0).cast("int")).alias(
                "y"
            ),
        )
        .toPandas()
    )
    pairs = list(zip(pdf["x"].tolist(), pdf["y"].tolist()))
    expected = _brute_tau_b(pairs)
    assert abs(row["tau_b"] - expected) < 1e-4
    assert row["n"] == len(pairs)


def test_weighted_reservoir_matches_bruteforce(spark):
    from fraud_detection_project_spark.catalog import load_table

    out = QUERIES["weighted_reservoir_orders"](spark, SF).collect()
    pdf = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice"
    ).toPandas()
    scored = []
    for k, w in zip(pdf["o_orderkey"], pdf["o_totalprice"]):
        u = (((int(k) * 1000003 + 7) % 999983) + 1.0) / 999984.0
        scored.append((math.log(u) / w, -int(k)))
    scored.sort(reverse=True)
    expected = [-s[1] for s in scored[:20]]
    assert [r["o_orderkey"] for r in out] == expected


def test_zorder_pruned_shards_contain_no_matches(spark):
    """Soundness of the zone-map audit: a shard the audit counts as
    pruned must contain ZERO rows matching the rectangle predicate —
    i.e. rows_scanned is an upper bound on the true match count."""
    from fraud_detection_project_spark.catalog import load_table

    audit = {
        r["layout"]: r
        for r in QUERIES["zorder_pruning_audit"](spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    matches = ev.filter(
        (F.col("value") >= 100)
        & (F.col("value") < 200)
        & (F.hour("ts") >= 8)
        & (F.hour("ts") < 14)
    ).count()
    total = ev.count()
    for layout, row in audit.items():
        assert row["rows_scanned"] >= matches, layout
        assert row["rows_scanned"] <= total, layout
    # z-ordering must never scan MORE than the audited natural layout
    # on this rectangle (it co-locates both dimensions).
    assert audit["zorder"]["rows_scanned"] <= audit["natural"]["rows_scanned"]


def test_compaction_files_cover_all_docs(spark):
    from fraud_detection_project_spark.catalog import load_table

    plan = QUERIES["compaction_binpack_plan"](spark, SF).collect()
    docs = (
        load_table(spark, SF, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars"))
        .collect()
    )
    by_src = {r["source"]: r for r in docs}
    for row in plan:
        src = by_src[row["source"]]
        # next-fit by start offset: between 8 and 9 files (a doc that
        # straddles the last boundary can open file index 8).
        assert 1 <= row["n_files"] <= 9, row
        assert row["max_docs_per_file"] <= src["n_docs"]
        # every file's fill is positive and the max file holds at most
        # target + one max-doc overshoot.
        assert row["avg_fill"] > 0


def test_fp_growth_pairs_match_manual_counts(spark):
    from fraud_detection_project_spark.catalog import load_table

    out = QUERIES["fp_growth_brand_itemsets"](spark, SF).collect()
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, SF, "part").select("p_partkey", "p_brand")
    basket = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .toPandas()
    )
    from collections import defaultdict

    orders = defaultdict(set)
    for ok, b in zip(basket["l_orderkey"], basket["p_brand"]):
        orders[ok].add(b)
    n = len(orders)
    minc = math.ceil(0.01 * n)
    singles = defaultdict(int)
    pairs = defaultdict(int)
    for items in orders.values():
        s = sorted(items)
        for i, a in enumerate(s):
            singles[a] += 1
            for b in s[i + 1 :]:
                pairs[f"{a},{b}"] += 1
    expected = {k: v for k, v in singles.items() if v >= minc}
    expected.update({k: v for k, v in pairs.items() if v >= minc})
    got = {r["itemset"]: r["freq"] for r in out}
    assert got == expected


def test_brier_identity_holds(spark):
    row = QUERIES["brier_decomposition"](spark, SF).collect()[0]
    # with the bin-mean forecast, Brier == uncertainty - resolution
    assert abs(row["brier_binned"] - row["brier_check"]) <= 2e-6


def test_mutual_information_bounds(spark):
    row = QUERIES["mutual_information_type_hour"](spark, SF).collect()[0]
    assert row["mi_nats"] >= -1e-9
    assert row["mi_nats"] <= min(row["h_type"], row["h_hour"]) + 1e-6
    assert 0.0 <= row["nmi"] <= 1.0 + 1e-9


def test_aqp_estimate_within_bounds(spark):
    rows = QUERIES["aqp_revenue_estimate"](spark, SF).collect()
    assert rows, "sample must be non-empty at sf0.001"
    for r in rows:
        assert r["n_samp"] > 0
        assert r["audit"] in {"ok", "outside_3se"}


def test_k_anonymity_consistency(spark):
    row = QUERIES["k_anonymity_audit"](spark, SF).collect()[0]
    assert row["min_k"] >= 1
    assert row["min_l"] >= 1
    assert row["min_l"] <= row["min_k"]
    assert 0.0 <= row["frac_rows_k_lt_5"] <= 1.0


def test_user_mix_shift_kl_nonnegative_bins(spark):
    rows = QUERIES["user_mix_shift_kl"](spark, SF).collect()
    assert all(r["kl_bin"] >= 0 for r in rows)
    # smoothed KL of a stable user is near 0 — the 0-bin must exist
    assert any(r["kl_bin"] == 0 for r in rows)


def test_dp_noise_is_laplace_shaped(spark):
    rows = QUERIES["dp_noisy_counts_by_type"](spark, SF).collect()
    for r in rows:
        assert abs(r["noisy_count"] - r["true_count"]) - r["abs_noise"] < 1e-3
        # eps=1, sensitivity 1: |noise| beyond 15 has probability e^-15
        assert r["abs_noise"] < 15.0


def test_fd_g3_matches_bruteforce(spark):
    from collections import Counter, defaultdict

    from fraud_detection_project_spark.catalog import load_table

    rows = {r["fd"]: r for r in QUERIES["fd_discovery_audit"](spark, SF).collect()}
    pdf = load_table(spark, SF, "part").select("p_brand", "p_type").toPandas()
    per_lhs = defaultdict(Counter)
    for b, t in zip(pdf["p_brand"], pdf["p_type"]):
        per_lhs[b][t] += 1
    kept = sum(c.most_common(1)[0][1] for c in per_lhs.values())
    n = len(pdf)
    got = rows["part.brand->type"]
    assert abs(got["g3_error"] - (1 - kept / n)) < 1e-6
    assert bool(got["holds"]) == (kept == n)
    # the key FD must hold exactly
    assert rows["orders.orderkey->priority"]["g3_error"] == 0.0
    assert bool(rows["orders.orderkey->priority"]["holds"])


def test_sortedness_ts_is_sorted_others_are_not(spark):
    rows = {
        r["col_name"]: r
        for r in QUERIES["sortedness_profile_events"](spark, SF).collect()
    }
    # ingest order IS timestamp order in the generator
    assert rows["ts"]["frac_nondecreasing"] == 1.0
    assert rows["ts"]["est_runs"] == 1
    assert rows["user_id"]["frac_nondecreasing"] < 0.9
    assert rows["value"]["frac_nondecreasing"] < 0.9


def test_stratified_sample_is_exact_per_stratum_topk(spark):
    import math
    from collections import defaultdict

    from fraud_detection_project_spark.catalog import load_table

    out = QUERIES["stratified_weighted_sample"](spark, SF).collect()
    pdf = (
        load_table(spark, SF, "events")
        .filter("value IS NOT NULL AND value > 0")
        .select("event_type", "event_id", "value")
        .toPandas()
    )
    best = defaultdict(list)
    for t, i, v in zip(pdf["event_type"], pdf["event_id"], pdf["value"]):
        u = ((int(i) * 1000003 + 7) % 999983 * 40503 % 999983 + 0.5) / 999983.0
        best[t].append((math.log(u) / v, -int(i)))
    expected = set()
    for t, lst in best.items():
        lst.sort(reverse=True)
        expected.update((t, -x[1]) for x in lst[:5])
    got = {(r["event_type"], r["event_id"]) for r in out}
    assert got == expected


def test_shapley_matches_bruteforce(spark):
    """Exact Shapley values recomputed by enumerating all 4! channel
    orderings over the collected coalition-value table."""
    from collections import defaultdict
    from itertools import permutations

    from fraud_detection_project_spark.catalog import load_table

    got = {
        r["channel"]: r["shapley"]
        for r in QUERIES["shapley_channel_attribution"](spark, SF).collect()
    }
    ev = (
        load_table(spark, SF, "events")
        .select("user_id", F.to_date("ts").alias("d"), "event_type")
        .toPandas()
    )
    bits = {"click": 1, "view": 2, "error": 4, "signup": 8}
    journeys = defaultdict(lambda: [0, 0])
    for u, d, t in zip(ev["user_id"], ev["d"], ev["event_type"]):
        j = journeys[(u, d)]
        if t == "purchase":
            j[1] = 1
        else:
            j[0] |= bits[t]
    v = defaultdict(lambda: [0, 0])
    for mask, conv in journeys.values():
        v[mask][0] += conv
        v[mask][1] += 1
    val = {m: (c / n if n else 0.0) for m, (c, n) in v.items()}
    for m in range(16):
        val.setdefault(m, 0.0)
    phis = defaultdict(float)
    chans = list(bits.items())
    for order in permutations(chans):
        mask = 0
        for name, bit in order:
            phis[name] += (val[mask | bit] - val[mask]) / 24.0
            mask |= bit
    for name in bits:
        assert abs(got[name] - phis[name]) < 1e-5, name


def test_retrieval_ndcg_matches_bruteforce(spark):
    import numpy as np

    from fraud_detection_project_spark.catalog import load_table

    row = QUERIES["retrieval_ndcg_mrr"](spark, SF).collect()[0]
    pdf = load_table(spark, SF, "embeddings").toPandas()
    vecs = np.array(pdf["embedding"].tolist(), dtype="float64")
    labels = pdf["label"].to_numpy()
    ids = pdf["vec_id"].to_numpy()
    qmask = ids % 37 == 0
    ndcgs, mrrs = [], []
    for qi in np.where(qmask)[0]:
        cos = vecs @ vecs[qi] / (
            np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[qi])
        )
        cos = np.round(cos, 6)
        cand = [(float(-cos[i]), int(ids[i]), int(labels[i] == labels[qi]))
                for i in range(len(ids)) if i != qi]
        cand.sort()
        rels = [c[2] for c in cand[:10]]
        dcg = sum(r / np.log2(i + 2) for i, r in enumerate(rels))
        m = min(10, sum(c[2] for c in cand))
        idcg = sum(1 / np.log2(i + 2) for i in range(m))
        ndcgs.append(dcg / idcg)
        first = next((i + 1 for i, r in enumerate(rels) if r), None)
        mrrs.append(1.0 / first if first else 0.0)
    assert row["n_queries"] == len(ndcgs)
    assert abs(row["avg_ndcg10"] - float(np.mean(ndcgs))) < 1e-4
    assert abs(row["avg_mrr10"] - float(np.mean(mrrs))) < 1e-4


def test_holt_kernel_matches_manual_recursion(spark):
    from fraud_detection_project_spark.catalog import load_table

    row = QUERIES["holt_linear_backtest"](spark, SF).collect()[0]
    daily = (
        load_table(spark, SF, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .orderBy("d")
        .toPandas()
    )
    y = daily["rev"].to_numpy(dtype="float64")
    l, b = y[0], y[1] - y[0]
    sae, cnt = 0.0, 0
    for t in range(1, len(y)):
        f = l + b
        sae += abs(f - y[t])
        cnt += 1
        l_new = 0.5 * y[t] + 0.5 * (l + b)
        b = 0.3 * (l_new - l) + 0.7 * b
        l = l_new
    assert row["n_days"] == len(y)
    assert abs(row["holt_mae"] - round(sae / cnt, 2)) < 0.02
