"""Scale-up probe: does each headline plan scale LINEARLY with input?

Synthesizes an N× copy of the sf0.1 fact tables (keys offset per copy so
cardinalities scale realistically: new orders, new lineitems, same
dimensions — exactly how a bigger TPC-H SF behaves), then times a set of
representative queries at 1× and N× and prints the time ratio per query.
A ratio ≈ N means the plan is linear in input (shuffle-bound at worst);
a ratio ≫ N exposes a super-linear stage (quadratic candidate blowup,
driver-side collection, single-partition bottleneck) that sf0.1 alone
cannot reveal.

Usage: python tools/scale_probe.py [factor] [query ...]
Writes the synthetic copies under /tmp/bcs_scale/ (removed and rebuilt
per run unless already present with the right factor).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from boltzmannclean_spark.plans.registry import all_queries
from boltzmannclean_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DIR = "/tmp/bcs_scale"

DEFAULT_QUERIES = [
    "pricing_summary",
    "join_revenue_by_nation",
    "events_sessionize",
    "dedup_exact",
    "text_tfidf_top_term",
    "ts_ohlc_bars",
    "agg_corr_matrix",
    "join_bloom_semireduction",
    # round-5 representatives
    "events_sessionize_skew",
    "dedup_embedding_cosine",
    "graph_pagerank_bipartite",
    # round-5 session: prefix-filtered exact similarity join and the
    # binned interval-overlap join — the two new candidate-generation
    # shapes whose scaling behavior a 10x probe can actually stress
    "dedup_prefix_filter_jaccard",
    "sessions_overlap_pairs",
    # round-5 session: TPC-H multi-agg chain (Q21: three stacked
    # order-keyed aggregations) and the blocked record linkage — the
    # shapes whose candidate/intermediate volume must stay linear
    "tpch_q21_waiting_suppliers",
    "dedup_blocked_editdist",
    "sample_poisson_bootstrap",
    # late round-5: row-local entropy (expect ~linear), grid spatial
    # join (output-bound under densification), day-partitioned sweep,
    # and the banding sweep (aggregation-only).
    "text_char_entropy",
    "join_geo_grid_distance",
    "events_peak_concurrency",
    "dedup_minhash_threshold_curve",
    # round-7: iterative community detection and the sequential
    # public-API dedup funnel (exact -> minhash -> substring chain).
    "graph_label_propagation",
    "pipeline_dedup_funnel",
]

# (table, key columns to offset per copy) — facts grow, dims stay.
# Only SELF-referential keys are offset (orderkeys, event/doc/vec ids,
# user ids): an offset FK into an UNSCALED dimension (o_custkey →
# customer, l_suppkey → supplier, …) would dangle, silently shrinking
# every dim-joining probe's output at Nx input and understating real
# scaling (round-4 advisor finding). Dim FKs keep their base domain, so
# dim joins fan out N× like a real bigger-SF dataset.
FACTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# Columns sharing a key DOMAIN must share one stride, or cross-table
# joins (orders ⋈ lineitem on orderkey) dangle between copies.
DOMAINS = {"o_orderkey": "orderkey", "l_orderkey": "orderkey"}
DIMS = ("region", "nation", "customer", "supplier", "part")


def build_scaled(spark, factor: int) -> str:
    out = f"{SCALE_DIR}/x{factor}"
    marker = f"{out}/.complete"
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for name in DIMS:
        df = spark.read.parquet(f"{BASE}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    # Offset keys per copy so joins/groupings keep realistic
    # cardinality (10x orders, not 10 duplicates of each order).
    # The offset stride is (max_key + 1) per key DOMAIN: copy i's keys
    # continue the base domain contiguously, so DENSE key spaces stay
    # dense (pairs_negative_sampling documents doc_id ∈ 0..N-1; a
    # power-of-ten stride broke that — round-4 advisor), and columns
    # in a shared domain (o_orderkey / l_orderkey) get the SAME stride
    # so cross-copy joins stay intact.
    domain_max: dict[str, int] = {}
    for name, keys in FACTS.items():
        df = spark.read.parquet(f"{BASE}/{name}.parquet")
        for k in keys:
            dom = DOMAINS.get(k, k)
            mx = df.agg(F.max(k)).collect()[0][0]
            domain_max[dom] = max(domain_max.get(dom, 0), mx)
    for name, keys in FACTS.items():
        df = spark.read.parquet(f"{BASE}/{name}.parquet")
        strides = {k: domain_max[DOMAINS.get(k, k)] + 1 for k in keys}
        copies = []
        for i in range(factor):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * strides[k]))
            copies.append(c)
        big = copies[0]
        for c in copies[1:]:
            big = big.unionAll(c)
        big.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    open(marker, "w").close()
    return out


def time_query(spark, name: str, sf_dir: str) -> float:
    q = all_queries()[name]
    samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        q.spark_fn(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    return min(samples)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("scale-probe")
    scaled = build_scaled(spark, factor)
    report = {"factor": factor, "base": BASE, "queries": {}}
    for name in names:
        try:
            t1 = time_query(spark, name, BASE)
            tn = time_query(spark, name, scaled)
            report["queries"][name] = {
                "t_1x": round(t1, 3),
                f"t_{factor}x": round(tn, 3),
                "ratio": round(tn / t1, 2) if t1 > 0 else None,
            }
            print(f"# {name}: {t1:.2f}s -> {tn:.2f}s (x{tn / t1:.1f})",
                  file=sys.stderr)
        except Exception as exc:
            report["queries"][name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
