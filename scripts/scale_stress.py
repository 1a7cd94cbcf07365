"""10x scale-stress harness (r10 verdict task 3): synthesize an sf1-shaped
dataset in SCRATCH (never touching read-only /root/testdata) by replicating
the sf0.1 tables 10x with id remapping that PRESERVES every mod-structure
the graded fixtures rely on, then time the top-cost entries at both scales
and report the time ratio. ~Linear scaling (ratio ~10 for 10x rows, minus
fixed overheads) is the pass shape; a banded/bucketed plan quietly going
quadratic shows up as a ratio far above the row growth.

Replica remapping (all offsets are multiples of every modulus a fixture
uses, so per-replica dup/changeset structure is EXACTLY the base one):

  documents  doc_id + i*10M  (%10 kept; clone ids +1M never collide);
             every replica>0 word-prefixed 'r{i}' => ZERO shared shingles
             across replicas, so near-dup clusters stay intra-replica and
             pair counts scale linearly (replicating identical text would
             square the cluster sizes — a fixture artifact, not a plan one)
  embeddings vec_id + i*1M   (%10 kept; +100k clones never collide);
             replica i applies the ORTHOGONAL sign flip s_i(j) = -1 iff
             j%10 < i: cosine is invariant under the same orthogonal
             transform on both vectors, so INTRA-replica dup structure is
             bit-for-bit the base one, while any two replicas differ on
             >=10% of dims' signs => cross-replica cosine drops far below
             the 0.999 dedup threshold. (A uniform additive shift — the
             first attempt — made high replicas near-parallel to the
             all-ones direction, cosine -> 1, and the dup pair set went
             QUADRATIC: a fixture artifact this harness itself caught.
             A multiplicative perturbation would match too: cosine is
             scale-invariant.)
  events     event_id + i*10M, user_id + i*1M, ts + 40*i days
  orders     o_orderkey + i*1.2M (multiple of lcm(3,4,10)=60 => the
             wins/cdc prefix, dup-pair, and pod-drop structures replicate)
  lineitem   l_orderkey + i*10k (%10 and %1000 kept => the grid entry's
             hot key stays key 0, hot slice grows 10x, dim stays ~541)
  others     copied once, unscaled (dimension tables)

Each entry runs TWICE per scale: run 1 pays one-time fixture builds
(cached_fixture), run 2 measures the operator itself — the ratio uses
run 2. Results print as one JSON line and a markdown table for SURVEY §8.

x_semdedup gets a second sf1 measurement with the DIAL SCALED: the entry
pins k=8, and SemDeDup's within-cell all-pairs cost is O(sum |cell|^2) —
with k fixed, 10x data means 10x-wider cells and ~100x pair work, the
DOCUMENTED behavior whose documented dial is k ~ N/target_cell. The
'x_semdedup@k80' row re-runs the same fixture with k=80 (constant cell
width), whose ratio vs the sf0.1 k=8 run is the honest linear-scaling
witness.

Usage: python scripts/scale_stress.py [entry ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10
ENTRIES = [
    "x_dedup_minhash_lsh",
    "x_semdedup",
    "x_similarity_pq",
    "x_ptable_cdc_e2e",
    "wins_e2e_rejects",
    "x_grid_skew_join",
    # r12 additions (r11 verdict task 6): the grid join's outer arms have
    # different asymptotics than the inner grid (key-count-sized anti
    # probes), the 1-bit hamming scan is |Q| x corpus popcount work, and
    # the minhash gate is the streaming-sink fold witness (per-batch
    # signature deltas + bands x state join, O(batch) write cost).
    "x_grid_skew_left",
    "x_grid_skew_full",
    "x_similarity_binary",
    "q_stream_minhash_gate",
    # late-r12: the RIGHT-outer grid arm (transpose anti probe only)
    "x_grid_skew_right",
    # r14: the gate's delta-compaction path (4 batches, compact_every=2 —
    # per-batch probe overhead bounded at O(compact_every) versions)
    "q_stream_minhash_gate_compacted",
]


def build_scaled(spark, out_dir: str) -> dict[str, int]:
    from pyspark.sql import functions as F

    rows: dict[str, int] = {}

    def _write(name, df):
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        rows[name] = spark.read.parquet(f"{out_dir}/{name}.parquet").count()

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    _write(
        "documents",
        _replicate(docs, lambda df, i: df.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            (
                F.col("text") if i == 0
                else F.regexp_replace("text", r"(\S+)", f"r{i}$1")
            ).alias("text"),
            "lang", "source", "n_chars",
        )),
    )
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    _write(
        "embeddings",
        _replicate(emb, lambda df, i: df.select(
            (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, j: F.when(
                    F.pmod(j, F.lit(10)) < F.lit(i), -x
                ).otherwise(x),
            ).alias("embedding"),
            "label",
        )),
    )
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    _write(
        "events",
        _replicate(ev, lambda df, i: df.select(
            (F.col("event_id") + i * 10_000_000).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {40 * i} DAYS")).alias("ts"),
            (F.col("user_id") + i * 1_000_000).alias("user_id"),
            "event_type", "value", "props",
        )),
    )
    od = spark.read.parquet(f"{BASE}/orders.parquet")
    _write(
        "orders",
        _replicate(od, lambda df, i: df.select(
            (F.col("o_orderkey") + i * 1_200_000).alias("o_orderkey"),
            "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        )),
    )
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    _write(
        "lineitem",
        _replicate(li, lambda df, i: df.select(
            (F.col("l_orderkey") + i * 10_000).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )),
    )
    for name in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(f"{BASE}/{name}.parquet", f"{out_dir}/{name}.parquet")
        rows[name] = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
    return rows


def _replicate(df, fn):
    out = fn(df, 0)
    for i in range(1, REPLICAS):
        out = out.unionByName(fn(df, i))
    return out


def _semdedup_k_scaled(spark, sf_dir, k):
    """x_semdedup's exact fixture with the cell-count dial scaled to the
    corpus (the published recipe: k ~ N / target_cell_width)."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.functions.vectors import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    clones = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 2.0).alias("embedding"),
    )
    return semantic_dedup(
        emb.unionByName(clones), k=k, iters=2, threshold=0.999
    )


def main() -> None:
    from flnr_wins_spark.plans.common import all_queries
    from flnr_wins_spark.session import get_spark

    only = sys.argv[1:] or ENTRIES
    spark = get_spark(app_name="flnr-wins-scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = tempfile.mkdtemp(prefix="flnr_sf1_")
    try:
        t0 = time.perf_counter()
        rows = build_scaled(spark, out_dir)
        print(f"# scaled dataset built in {time.perf_counter() - t0:.1f}s "
              f"at {out_dir}: { {k: v for k, v in rows.items()} }", flush=True)
        qs = all_queries()
        result: dict[str, dict] = {}
        for name in only:
            result[name] = {}
            for sf_dir, tag in ((BASE, "sf0.1"), (out_dir, "sf1")):
                ts = []
                for _run in (1, 2):
                    t1 = time.perf_counter()
                    qs[name].fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    ts.append(round(time.perf_counter() - t1, 2))
                result[name][tag] = ts
            r01, r1 = result[name]["sf0.1"][1], result[name]["sf1"][1]
            result[name]["ratio"] = round(r1 / r01, 2) if r01 > 0 else None
            print(f"# {name}: sf0.1 {result[name]['sf0.1']} s, "
                  f"sf1 {result[name]['sf1']} s, ratio {result[name]['ratio']}",
                  flush=True)
        if "x_semdedup" in result:
            # the dial-scaled twin: k grows with the corpus so cell width
            # (and per-row pair work) stays constant — the linear witness
            name = "x_semdedup@k80"
            ts = []
            for _run in (1, 2):
                t1 = time.perf_counter()
                _semdedup_k_scaled(spark, out_dir, k=8 * REPLICAS).write.format(
                    "noop"
                ).mode("overwrite").save()
                ts.append(round(time.perf_counter() - t1, 2))
            base_t = result["x_semdedup"]["sf0.1"][1]
            result[name] = {
                "sf0.1": result["x_semdedup"]["sf0.1"], "sf1": ts,
                "ratio": round(ts[1] / base_t, 2) if base_t > 0 else None,
            }
            print(f"# {name}: sf1 {ts} s, ratio vs sf0.1 k=8 "
                  f"{result[name]['ratio']}", flush=True)
        print(json.dumps({
            "replicas": REPLICAS, "entries": result,
            # self-adjudication metadata (r13 VERDICT task 5): host load
            # at report time distinguishes weather from plan regressions
            # from the artifact alone
            "load_1m": round(os.getloadavg()[0], 2),
        }))
        print("\n| entry | sf0.1 run2 (s) | sf1 run2 (s) | ratio |")
        print("|---|---|---|---|")
        for name, r in result.items():
            print(f"| {name} | {r['sf0.1'][1]} | {r['sf1'][1]} | {r['ratio']} |")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
