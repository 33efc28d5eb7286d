#!/usr/bin/env python
"""sf1 scale probe for the heavy operator families (round 7).

The per-round bench runs at sf0.1; this probe answers the question that
bench cannot: do the dedup/CC/ANN/graph/CMS families actually scale
LINEARLY when the data grows 10x, as their docstrings claim?

Probe data (written once to --out, default .scale_probe/sf1): each base
table from /root/testdata/sf0.1 replicated --factor times with DISJOINT
key/vocabulary domains per replica —

* documents: doc_id shifted; replica r>0 suffixes every word with
  ``_r{r}`` so each replica is an independent sf0.1-like corpus (same
  per-replica near-dup density; total pairs grow exactly linearly).
  Without the disjoint vocabulary, replicas would be near-dups of each
  other and the PAIR COUNT itself would grow quadratically — a property
  of the copied data, not of the engine, drowning the signal the probe
  is after.  n_chars is recomputed to match the mutated text.
* embeddings: vec_id shifted; replica r's vectors are cyclically
  rotated by r dimensions — norms and within-replica cosines are
  preserved exactly, cross-replica cosines decorrelate, so IVF/LSH see
  10x the points with the same local geometry.
* events / lineitem / orders / customer / supplier / part: ids shifted
  into disjoint ranges with ONE step per key domain shared by every
  table that references it (orderkey, partkey, suppkey, custkey), so
  cross-table foreign keys hold in every replica; nation/region stay
  verbatim with nationkeys unshifted.  Values/timestamps untouched
  (10x density over the same time span).

Probe queries: the registered heavy-family queries, run with the same
adjacent warm->clear->time discipline as bench.py at BOTH scales in one
session.  Output: a per-query table of (sf0.1 s, sf1 s, ratio) plus one
JSON line, and a per-family verdict — ratio ~<= factor means the claim
of linear scaling holds at this step (AQE re-plans, fixed planning
latency and codegen amortization usually land ratios well UNDER the
data factor for the cheap queries).

Usage: python scripts/scale_probe.py [--factor 10] [--out DIR] [--skip-gen]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

PROBE_QUERIES = {
    "dedup": [
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "cross_source_shingle_overlap",
    ],
    "cc": [
        "dedup_clusters",
        "dedup_clusters_star",
        "dedup_clusters_incremental",
        "dup_cluster_size_histogram",
    ],
    "ann": ["ann_lsh_bucketed", "ann_ivf", "ann_quantized"],
    "graph": ["pagerank_neardup", "copurchase_triangles"],
    "cms": ["term_cms_heavy_hitters", "cms_contamination_probe"],
    # round-7 late additions that compose the heavy CC/pair subplans
    # (the rest of that batch — SCD2, FK audit, recall report — is
    # plain join/window/agg shapes the TPC-H families already probe)
    "dedup_lifecycle": ["dedup_keep_best", "leakage_safe_split"],
}


def build(spark, out: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from firmable_company_data_pipeline_spark.queries.core import load_tables

    os.makedirs(out, exist_ok=True)

    def replicas(df, shifts: dict, mutate=None):
        parts = []
        for r in range(factor):
            part = df
            for col, step in shifts.items():
                part = part.withColumn(col, F.col(col) + F.lit(r * step))
            if mutate is not None:
                part = mutate(part, r)
            parts.append(part)
        res = parts[0]
        for p in parts[1:]:
            res = res.unionByName(p)
        return res

    t = load_tables(
        spark,
        SRC,
        "documents",
        "embeddings",
        "events",
        "lineitem",
        "orders",
        "customer",
        "supplier",
        "part",
    )

    # shift steps derived from the actual id ranges (review r7: hardcoded
    # guesses would silently overlap replicas if the testdata were ever
    # regenerated at a different sf) — one tiny max() job per table
    def step(df, *cols):
        row = df.agg(*(F.max(c) for c in cols)).first()
        return {c: int(v) + 1 for c, v in zip(cols, row)}

    # ONE step per key DOMAIN, shared by every table referencing it
    # (review r7: per-table steps broke all cross-table foreign keys —
    # replica r's l_partkey pointed at parts that were never generated,
    # so any join-family query added to the probe would silently measure
    # ~1x effective data).  events.user_id belongs to the custkey domain
    # too (customer joins events on c_custkey == user_id); nation/region
    # stay verbatim and nationkeys unshifted, so customer/supplier ->
    # nation joins hold in every replica.  One multi-column max() job
    # per table.
    domain_cols = {
        "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
        "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
        "part": {"p_partkey": "partkey"},
        "supplier": {"s_suppkey": "suppkey"},
        "customer": {"c_custkey": "custkey"},
        "events": {"user_id": "custkey"},
    }
    dom = {}
    for table, cols in domain_cols.items():
        steps = step(t[table], *cols)
        for col, domain in cols.items():
            dom[domain] = max(dom.get(domain, 0), steps[col])

    def dsteps(*cols):
        return {c: dom[domain_cols_flat[c]] for c in cols}

    domain_cols_flat = {c: d for cols in domain_cols.values() for c, d in cols.items()}

    # rotation-validity guard BEFORE any expensive writes: replica
    # indices run 0..factor-1, so rotations stay distinct while
    # factor-1 < dim (review r7: the earlier >= guard was off by one
    # and ran after the documents replica set was already written)
    dim = len(t["embeddings"].select("embedding").first()[0])
    if factor > dim:
        raise ValueError(
            f"--factor {factor} > embedding dim {dim}: replica rotations would "
            "wrap to identity, making exact vector duplicates of replica 0 and "
            "reintroducing the quadratic cross-replica pairing the disjoint "
            "replica design exists to prevent"
        )

    def mut_docs(df, r):
        if r == 0:
            return df
        txt = F.regexp_replace("text", r"(\S+)", f"$1_r{r}")
        return df.withColumn("text", txt).withColumn("n_chars", F.length("text"))

    replicas(t["documents"], step(t["documents"], "doc_id"), mut_docs).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "documents.parquet"))

    def mut_vecs(df, r):
        if r == 0:
            return df
        rot = F.expr(
            f"concat(slice(embedding, {r + 1}, {dim - r}), "
            f"slice(embedding, 1, {r}))"
        )
        return df.withColumn("embedding", rot)

    replicas(t["embeddings"], step(t["embeddings"], "vec_id"), mut_vecs).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "embeddings.parquet"))

    # events/orders are replicated even though no current probe family
    # reads them: a "10x" directory where only some fact tables scaled
    # would silently under-measure any family added later — the disk
    # cost at these SFs is trivial, the footgun is not.
    ev_steps = step(t["events"], "event_id")
    ev_steps["user_id"] = dom["custkey"]
    replicas(t["events"], ev_steps).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )

    replicas(
        t["lineitem"], dsteps("l_orderkey", "l_partkey", "l_suppkey")
    ).write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))

    replicas(t["orders"], dsteps("o_orderkey", "o_custkey")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "orders.parquet"))

    replicas(t["customer"], dsteps("c_custkey")).write.mode("overwrite").parquet(
        os.path.join(out, "customer.parquet")
    )
    replicas(t["supplier"], dsteps("s_suppkey")).write.mode("overwrite").parquet(
        os.path.join(out, "supplier.parquet")
    )
    replicas(t["part"], dsteps("p_partkey")).write.mode("overwrite").parquet(
        os.path.join(out, "part.parquet")
    )

    # nation/region verbatim (nationkeys unshifted — see the FK note)
    import shutil

    for name in ("region", "nation"):
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(SRC, f"{name}.parquet"), dst)


def time_queries(spark, qs, names, sf_dir: str) -> dict:
    # bench.py's exact measurement discipline (warm -> clear+gc -> timed
    # with one retry -> clear+gc), shared so probe ratios are comparable
    # to bench numbers (review r7)
    from bench import timed_query_run

    out = {}
    for name in names:
        secs, err = timed_query_run(spark, qs[name], sf_dir)
        out[name] = secs if secs is not None else f"ERROR: {err}"
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale_probe/sf1",
        ),
    )
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument(
        "--passes",
        type=int,
        default=3,
        help="timing passes; the table reports per-query MINIMA across "
        "passes (single sf0.1-scale runs swing several x under JVM/GC/"
        "codegen interference; the minimum is the robust what-can-the-"
        "engine-do estimator, and the per-pass values are kept in the "
        "JSON line for inspection)",
    )
    args = ap.parse_args()

    # the same session factory bench uses (review r7): hand-rolling the
    # builder dropped the codegen-cache sizing, worker PYTHONPATH export
    # and CPU autodetection that keep timings comparable to bench's
    from firmable_company_data_pipeline_spark.session import get_spark

    spark = get_spark("firmable-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not args.skip_gen:
        print(f"generating factor-{args.factor} probe data at {args.out} ...")
        build(spark, args.out, args.factor)

    import __spark_entry__ as entry

    qs = entry.queries()
    names = [n for fam in PROBE_QUERIES.values() for n in fam]
    base_passes, big_passes = [], []
    for p in range(max(1, args.passes)):
        base_passes.append(time_queries(spark, qs, names, SRC))
        big_passes.append(time_queries(spark, qs, names, args.out))

    def minima(passes):
        out = {}
        for n in names:
            vals = [p[n] for p in passes if isinstance(p.get(n), (int, float))]
            out[n] = min(vals) if vals else passes[-1].get(n)
        return out

    base, big = minima(base_passes), minima(big_passes)

    print(f"\n{'query':34s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}   (minima over {len(base_passes)} passes)")
    ratios = {}
    for fam, fam_names in PROBE_QUERIES.items():
        for n in fam_names:
            b, g = base.get(n), big.get(n)
            if isinstance(b, float) and isinstance(g, float) and b > 0:
                ratios[n] = round(g / b, 2)
                print(f"{n:34s} {b:8.2f} {g:8.2f} {ratios[n]:7.2f}")
            else:
                print(f"{n:34s} {b!s:>8s} {g!s:>8s}     n/a")
    print(
        json.dumps(
            {
                "factor": args.factor,
                "passes": len(base_passes),
                "base": base,
                "scaled": big,
                "ratios": ratios,
                "base_passes": base_passes,
                "scaled_passes": big_passes,
            }
        )
    )


if __name__ == "__main__":
    main()
