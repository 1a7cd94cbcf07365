"""Local differential harness mimicking the driver's correctness gate:
run every queries() entry on Spark and its oracle_sql() twin on DuckDB over
the same parquet tables; compare row count, schema width, and
order-insensitive values (exact, after column-name sort).

Usage: python scripts/check_oracle.py [sf_dir] [name ...]

Set ``SPARK_GRAFT_BARE=1`` to run against a *default-config* SparkSession
(as the driver builds its own) instead of ``session.get_spark`` — proves the
query surface does not depend on our session confs (timezone, nanos flag,
shuffle partitions).
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


class BinaryColumnError(TypeError):
    """Raised when a *graded* projection emits raw binary. The driver's
    canonicalizer pandas-factorizes rows and dies on ``bytearray`` (what both
    PySpark and DuckDB hand back for BLOB columns), so anything that would
    pass here by silently hexing must instead fail loudly: graded outputs
    must project ``lower(hex(col))`` on both sides (see CORRECTNESS_r03
    wins_e2e_* failure)."""


class DecimalColumnError(TypeError):
    """Raised when a *graded* projection emits a ``decimal.Decimal`` outside
    exact-int64 range (or with a fractional part). The driver's
    pandas-factorize canonicalizer can surface high-precision DECIMAL
    differently per engine (object ``Decimal`` from Spark's ``toPandas`` vs
    float64 from DuckDB's ``.df()``), which factorizes as unequal keys —
    the CORRECTNESS_r05 ``x_embedding_covariance`` hash_match=false root
    cause, fourth instance of the representability bug class (bytearray
    r03, arrays r04, libm-ulp floats r04). Graded outputs must project
    wide decimals as strings (``CAST(col AS VARCHAR)`` / ``.cast("string")``)
    on both sides."""


class ArrayColumnError(TypeError):
    """Raised when a *graded* projection emits an ARRAY/MAP/STRUCT value.
    The driver's canonicalizer pandas-factorizes rows and dies on Python
    lists/dicts (``TypeError: unhashable type: 'list'`` —
    CORRECTNESS_r04 x_random_projection), so anything that would pass here
    by silently tuple-izing must instead fail loudly: graded outputs must
    flatten arrays to scalar columns or a single string on both sides."""


def canon(v, strict_binary=True):
    import decimal

    if isinstance(v, decimal.Decimal):
        # In-range integral decimals canonicalize to int (both engines
        # factorize them identically); anything wider or fractional must be
        # projected as a string by the graded entry itself.
        if v == v.to_integral_value() and abs(v) < (1 << 63):
            return int(v)
        raise DecimalColumnError(
            f"Decimal value {v} outside exact-int64 range (or fractional) in "
            "graded output — the driver harness factorizes Decimal vs "
            "float64 as unequal keys; CAST to VARCHAR/string on both sides"
        )
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        if strict_binary:
            raise BinaryColumnError(
                "raw binary value in graded output — the driver harness cannot "
                "hash bytearray; project lower(hex(col)) on both sides instead"
            )
        return bytes(v).hex()
    if isinstance(v, (list, tuple, dict)):
        raise ArrayColumnError(
            "array/map/struct value in graded output — the driver harness "
            "cannot hash Python lists; flatten to scalar columns "
            "(rp[0] AS rp0 ...) or one string (concat_ws/to_json) on both sides"
        )
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from flnr_wins_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if os.environ.get("SPARK_GRAFT_BARE"):
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").getOrCreate()
        print("# BARE session (driver-mimic): default confs, no session.py setup")
    else:
        spark = get_spark(shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    timings: dict[str, float] = {}  # Spark-side seconds (fn + collect)
    load_start = os.getloadavg()[0]
    sweep_t0 = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            continue
        timings[name] = round(time.time() - t0, 2)
        if name not in oracles:
            print(f"ok?  {name}: rows-only, {len(srows)} rows  ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"     WARNING: {name} returned 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failures.append(name)
            continue
        ok = True
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            ok = False
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            print(f"FAIL {name}: columns spark={scols} duckdb={dcols}")
            ok = False
        if ok:
            try:
                ms, md = rows_to_multiset(scols, srows), rows_to_multiset(dcols, drows)
            except (BinaryColumnError, ArrayColumnError) as e:
                print(f"FAIL {name}: {e}")
                failures.append(name)
                continue
            if ms != md:
                only_s = {k: c for k, c in ms.items() if md.get(k) != c}
                only_d = {k: c for k, c in md.items() if ms.get(k) != c}
                print(f"FAIL {name}: value mismatch ({len(only_s)} spark-only, {len(only_d)} duckdb-only)")
                for k in list(only_s)[:3]:
                    print(f"  spark : {k}")
                for k in list(only_d)[:3]:
                    print(f"  duckdb: {k}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print()
    if not only:
        _record_timings(
            sf_dir, timings,
            run_meta={
                "total_sec": round(time.time() - sweep_t0, 1),
                "load_1m_start": round(load_start, 2),
                "load_1m_end": round(os.getloadavg()[0], 2),
                "finished_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%S%z", time.localtime()
                ),
            },
        )
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all green")


def _record_timings(
    sf_dir: str, timings: dict[str, float], run_meta: dict | None = None
) -> None:
    """Persist per-entry Spark wall time for FULL sweeps and report >2x
    round-over-round drift against the previous artifact. The bench set
    covers ~38 of the 250+ entries; the full-registry sweep executes
    every one, so this is the only perf signal the other ~215 have —
    a quietly-superlinear plan change shows up here before it shows up
    anywhere else. Drift lines are informational (host weather inflates
    whole sweeps; the |log ratio| filter plus the 0.5 s absolute floor
    keeps the list short and shape-changes prominent).

    Self-adjudication (r13 VERDICT task 5): besides the latest run's
    per-entry timings, the artifact keeps a ``runs`` history (last 4)
    of {total_sec, load_1m_start/end, finished_at, entries}, so a
    weather-inflated sweep is distinguishable from a plan regression
    FROM THE CHECKED-IN FILE alone — high load or an earlier healthy
    run with identical shape adjudicates without external notes."""
    import json

    base = os.path.basename(os.path.normpath(sf_dir))
    mode = "bare" if os.environ.get("SPARK_GRAFT_BARE") else "session"
    tag = "_bare" if mode == "bare" else ""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SWEEP_TIMINGS_{base}{tag}.json",
    )
    prev: dict[str, float] = {}
    prev_runs: list[dict] = []
    if os.path.exists(path):
        try:
            doc = json.load(open(path))
            prev = doc.get("entries", {})
            prev_runs = doc.get("runs", [])
        except Exception:
            prev = {}
    drift = [
        (n, prev[n], s)
        for n, s in timings.items()
        if n in prev
        and max(s, prev[n]) > 0.5
        and (s > 2 * prev[n] or prev[n] > 2 * s)
    ]
    if drift:
        print(f"TIMING DRIFT >2x vs previous sweep ({len(drift)} entries):")
        for n, p, s in sorted(drift, key=lambda x: -max(x[1], x[2])):
            print(f"  {n}: {p:.2f}s -> {s:.2f}s")
        print()
    runs = (prev_runs + [{**(run_meta or {}), "entries": timings}])[-4:]
    with open(path, "w") as fh:
        json.dump(
            {"sf": base, "mode": mode, "entries": timings, "runs": runs},
            fh, indent=0, sort_keys=True,
        )
        fh.write("\n")
    print(f"# per-entry timings -> {path}")


if __name__ == "__main__":
    main()
