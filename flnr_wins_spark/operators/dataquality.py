"""Data-quality expectation suite + column profiler (deequ-style).

The reference's only quality mechanism is the QA-reject pair (duplicate keys,
failed lookups — ``src/wins_transform_staging.py:236-273``); a standing
100 TB pipeline additionally needs *declarative* table-level checks
(completeness, distinctness, bounds, pattern conformance) evaluated before
data is published, and a per-column statistical profile for drift detection.
Both are engine extensions grounded in public designs (AWS Deequ / TFX data
validation).

Scale notes: every check and every profile metric is computed in ONE
aggregation pass over the table — all metrics are map-side-combinable
(count/min/max/decimal-sum) except COUNT(DISTINCT), which Spark plans as a
single expand + two-phase aggregate; nothing is collected to the driver and
the per-check fan-out happens on a one-row aggregate via ``stack``.
Determinism: fractions are ratios of exact BIGINT counts (single IEEE
division — bit-identical in any engine); average lengths go through exact
DECIMAL sums (``common.dsum`` pattern).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named expectation: ``metric`` is a deterministic DOUBLE aggregate
    over the table; the check passes when ``metric >= threshold`` (or
    ``<= threshold`` when ``op='le'``)."""

    name: str
    metric: Column
    threshold: float
    op: str = "ge"  # 'ge' | 'le'


def _ratio(num: Column, den: Column) -> Column:
    # try_divide: an EMPTY table (or an all-null column) yields NULL metrics
    # instead of an ANSI DIVIDE_BY_ZERO error — checks on empty inputs read
    # as "no evidence", and NULL >= threshold is false, so they fail closed
    return F.try_divide(
        num.cast("bigint").cast("double"), den.cast("bigint").cast("double")
    )


def completeness(col: str, threshold: float = 1.0) -> Check:
    """Fraction of rows where ``col`` is non-null."""
    return Check(
        f"completeness({col})",
        _ratio(F.count(F.col(col)), F.count(F.lit(1))),
        threshold,
    )


def distinctness(col: str, threshold: float = 1.0) -> Check:
    """Distinct values / rows; 1.0 means the column is a unique key."""
    return Check(
        f"distinctness({col})",
        _ratio(F.count_distinct(F.col(col)), F.count(F.lit(1))),
        threshold,
    )


def min_bound(col: str, lo: float) -> Check:
    """MIN(col) >= lo."""
    return Check(f"min({col})", F.min(F.col(col)).cast("double"), lo)


def max_bound(col: str, hi: float) -> Check:
    """MAX(col) <= hi."""
    return Check(f"max({col})", F.max(F.col(col)).cast("double"), hi, op="le")


def pattern_conformance(col: str, regex: str, threshold: float = 1.0) -> Check:
    """Fraction of non-null values matching ``regex`` (JVM regexp — stays
    inside whole-stage codegen). ``rlike`` is search semantics; anchor with
    ``^...$`` for full-value conformance."""
    return Check(
        f"pattern({col})",
        _ratio(
            F.sum(F.when(F.col(col).rlike(regex), 1).otherwise(0)),
            F.count(F.col(col)),
        ),
        threshold,
    )


def containment(col: str, allowed: list[str], threshold: float = 1.0) -> Check:
    """Fraction of non-null values inside the allowed set."""
    return Check(
        f"containment({col})",
        _ratio(
            F.sum(F.when(F.col(col).isin(allowed), 1).otherwise(0)),
            F.count(F.col(col)),
        ),
        threshold,
    )


def check_expectations(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all ``checks`` in one aggregation pass.

    Returns ``(check STRING, metric DOUBLE, passed BOOLEAN)`` — one row per
    check, fan-out applied to the single aggregate row so the table itself is
    scanned exactly once regardless of how many expectations are declared.
    """
    agg_row = df.agg(*[c.metric.alias(f"_m{i}") for i, c in enumerate(checks)])
    stack_args: list[Column] = []
    for i, c in enumerate(checks):
        m = F.col(f"_m{i}")
        passed = (m >= F.lit(c.threshold)) if c.op == "ge" else (m <= F.lit(c.threshold))
        stack_args.extend([F.lit(c.name), m, passed])
    n = len(checks)
    return agg_row.select(
        F.stack(F.lit(n), *stack_args).alias("check", "metric", "passed")
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column statistical profile in one pass.

    For each column: row count, null count, distinct count, lexicographic
    min/max of the string rendering, and average rendered length (exact
    DECIMAL sum, so the double is order-insensitive). String rendering keeps
    the output schema uniform across column types; callers profiling DOUBLE
    columns should pre-round (engine string renderings of floats differ).

    Returns ``(col_name, n, nulls, n_distinct, min_s, max_s, avg_len)``.
    """
    aggs: list[Column] = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for i, c in enumerate(cols):
        s = F.col(c).cast("string")
        aggs.extend(
            [
                F.count(s).cast("bigint").alias(f"_nn{i}"),
                F.count_distinct(s).cast("bigint").alias(f"_nd{i}"),
                F.min(s).alias(f"_mn{i}"),
                F.max(s).alias(f"_mx{i}"),
                F.sum(F.length(s).cast("decimal(27,0)")).alias(f"_sl{i}"),
            ]
        )
    agg_row = df.agg(*aggs)
    stack_args: list[Column] = []
    for i, c in enumerate(cols):
        stack_args.extend(
            [
                F.lit(c),
                F.col("_n"),
                (F.col("_n") - F.col(f"_nn{i}")).cast("bigint"),
                F.col(f"_nd{i}"),
                F.col(f"_mn{i}"),
                F.col(f"_mx{i}"),
                F.try_divide(
                    F.col(f"_sl{i}").cast("double"), F.col(f"_nn{i}").cast("double")
                ),
            ]
        )
    return agg_row.select(
        F.stack(F.lit(len(cols)), *stack_args).alias(
            "col_name", "n", "nulls", "n_distinct", "min_s", "max_s", "avg_len"
        )
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Privacy audit before publishing a derived table: group rows into
    equivalence classes over the quasi-identifier columns and report, per
    class, its size (k-anonymity: every class must reach ``k``) and the
    number of distinct sensitive values (l-diversity: a class whose
    sensitive attribute is constant re-identifies even when k-anonymous).
    Callers generalize quasi-identifiers (bucket, truncate) and re-run
    until no class violates — the audit half of Sweeney's k-anonymity /
    Machanavajjhala's l-diversity, as a one-aggregation-pass operator.

    Returns ``(quasi..., class_size, l_div, violates_k, violates_l)``.
    Scale: one groupBy shuffle on the quasi key; the distinct-count is the
    standard expand+two-phase plan. Class count <= row count — no fan-out.
    """
    return df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).cast("bigint").alias("l_div"),
    ).select(
        *quasi_cols,
        "class_size",
        "l_div",
        (F.col("class_size") < k).alias("violates_k"),
        (F.col("l_div") < l).alias("violates_l"),
    )


def dp_group_counts(
    df: DataFrame,
    group_col: str,
    epsilon_inv: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Differentially-private group counts via the Laplace mechanism —
    the release half of the privacy family (k_anonymity/l_diversity audit
    risk; this adds eps-DP noisy counts for publishing aggregates from a
    100 TB corpus without exposing individual membership).

    Noise is CONTENT-ADDRESSED (md5 of group + seed), which makes the
    release reproducible across engines, re-runs, and partitionings —
    operationally essential (re-running a nightly job must not re-draw
    noise, or differencing two runs leaks the true count; this is the
    "sticky noise" practice). Exactness discipline:

      * u = (2h+1)/2^37 with h the first 36 md5 bits — an exact dyadic
        rational, so ``t = 2u-1 = (4h+2-2^37)/2^37`` and ``1-|t|`` are
        both EXACT doubles (integer numerators over a power of two);
      * Laplace inverse-CDF: ``noise = -b * sign(t) * ln(1-|t|)`` with
        scale ``b = epsilon_inv = 1/eps`` (integer — the sensitivity-1
        count mechanism at eps = 1/epsilon_inv); the one libm call
        (ln) rounds through DECIMAL(27,9) per the plans/common.py rule,
        after which every remaining factor is an exact integer;
      * graded columns are exact 1e-9 BIGINT units (noise_e9,
        noisy_count_e9 = n*1e9 + noise_e9) — driver-representable.

    One count shuffle on the group key; the noise expression is pure
    per-row JVM arithmetic on the group name. True counts ride along for
    the differential harness; a real release would drop ``n``.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dp:"), F.col("g").cast("string"),
                           F.lit(f":{seed}"))), 1, 9
        ),
        16,
        10,
    ).cast("long")
    counts = (
        df.select(F.col(group_col).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    num = 4 * h + 2 - F.lit(1 << 37).cast("long")  # 2^37 * (2u - 1), exact
    absd = F.abs(num).cast("double") / F.lit(float(1 << 37))  # exact dyadic
    sign = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    # decimal(20,9), NOT (27,9): the 1e9 scale-shift multiply must keep
    # precision 20+10+1 = 31 <= 38, or Spark's precision-overflow rule
    # silently truncates the 9-decimal tail to 6 digits
    ln_dec = F.log(F.lit(1.0) - absd).cast("decimal(20,9)")
    noise_e9 = ((F.lit(-epsilon_inv) * sign) * (ln_dec * F.lit(1_000_000_000))).cast(
        "bigint"
    )
    return counts.select(
        "g",
        "n",
        noise_e9.alias("noise_e9"),
        (F.col("n") * F.lit(1_000_000_000) + noise_e9).alias("noisy_count_e9"),
    )


def drift_psi(
    cur: DataFrame,
    ref: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index drift detection — the standard ML-ops
    monitor for "has the serving distribution moved away from the
    training distribution": equal-width bins over a FIXED [lo, hi) range
    (fixed, not data-derived — a quantile grid would itself drift),
    per-bin ``term = (p - q) * ln(p / q)`` with additive (+1) smoothing so
    empty bins never divide by zero; PSI = sum of terms (rule of thumb:
    < 0.1 stable, > 0.25 action).

    Exactness: bin ids clamp through floor on exact-arithmetic doubles;
    p and q are single correctly-rounded divisions of exact integers; the
    one libm ln rounds through DECIMAL(20,9); the per-bin term is a fixed
    parenthesization — engine-identical per bin, and the caller's sum over
    ``bins`` rows is tiny. Rows with NULL values are excluded from both
    sides. Returns one row per bin: (bin, n_cur, n_ref, psi_term).

    Scale shape: two count shuffles (map-side combine) down to
    ``bins``-sized frames, everything after is broadcast arithmetic.
    """
    if bins < 2 or not hi > lo:
        raise ValueError("need bins >= 2 and hi > lo")
    spark = cur.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    counts = (
        grid.join(psi_bin_counts(cur, value_col, lo, hi, bins, "n_cur"), "bin", "left")
        .join(psi_bin_counts(ref, value_col, lo, hi, bins, "n_ref"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
            F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
        )
    )
    return psi_terms(counts, bins)


def psi_bin_counts(
    df: DataFrame, value_col: str, lo: float, hi: float, bins: int, out: str
) -> DataFrame:
    """Bin counts on the fixed PSI grid — the ONE binning definition
    shared by the batch operator and the streaming drift sink (their
    equivalence depends on both binning identically)."""
    width = (hi - lo) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (F.col(value_col).cast("double") - F.lit(float(lo)))
                / F.lit(float(width))
            ).cast("int"),
        ),
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias(out))
    )


def psi_terms(counts: DataFrame, bins: int) -> DataFrame:
    """Per-bin PSI terms from a (bin, n_cur, n_ref) counts frame — the ONE
    term arithmetic shared by the batch operator and the streaming
    reader, so streaming and batch scores can never silently diverge."""
    tot = counts.groupBy().agg(
        F.sum("n_cur").cast("bigint").alias("nt_cur"),
        F.sum("n_ref").cast("bigint").alias("nt_ref"),
    )
    p = (F.col("n_cur") + F.lit(1)).cast("double") / (
        F.col("nt_cur") + F.lit(bins)
    ).cast("double")
    q = (F.col("n_ref") + F.lit(1)).cast("double") / (
        F.col("nt_ref") + F.lit(bins)
    ).cast("double")
    ln_dec = F.log(p / q).cast("decimal(20,9)")
    term = (p - q) * ln_dec.cast("double")
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin", "n_cur", "n_ref", term.alias("psi_term")
    )


def fd_check(
    df: DataFrame, candidates: list[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency audit (the data-profiling classic): for each
    candidate ``lhs -> rhs``, does every ``lhs`` value determine exactly
    one ``rhs`` value? Reports per candidate the number of determinant
    groups, how many VIOLATE (carry >1 distinct rhs, NULL counted as a
    value via the null-safe distinct), and the verdict — the evidence
    schema-inference, key discovery, and denormalization checks build on
    (Metanome/HyFD territory, restricted to declared candidates: full FD
    *search* is exponential in columns and belongs offline).

    One aggregation pass PER CANDIDATE over a (lhs, rhs) projection —
    each is a two-column groupBy with map-side combine; candidates are
    checked independently so Spark runs them as separate narrow jobs.
    Returns (lhs, rhs, n_groups, n_violating, holds).
    """
    spark = df.sparkSession
    outs = []
    for lhs, rhs in candidates:
        g = (
            df.select(F.col(lhs).alias("_l"), F.col(rhs).alias("_r"))
            .groupBy("_l")
            .agg(
                # null-safe distinct-rhs count: count_distinct DROPS NULLs
                # (a struct-wrapped collect_set would KEEP a null-field
                # struct and double-count), so add the null "value" back
                # when the group contains one — matching the SQL twin's
                # COUNT(DISTINCT rhs) + MAX(rhs IS NULL)
                F.count_distinct(F.col("_r")).alias("_nd"),
                F.max(F.col("_r").isNull().cast("int")).alias("_has_null"),
            )
            .select((F.col("_nd") + F.col("_has_null")).alias("_ndr"))
        )
        row = g.groupBy().agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum((F.col("_ndr") > 1).cast("bigint")).alias("n_violating"),
        )
        outs.append(
            row.select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_groups",
                F.coalesce("n_violating", F.lit(0)).cast("bigint").alias("n_violating"),
                (F.coalesce("n_violating", F.lit(0)) == 0).alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
