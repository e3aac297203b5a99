#!/usr/bin/env python
"""Research-side analyses from the reference's docs/research pipelines,
re-expressed as Spark plans over the engine's tables (SURVEY.md §2.D9:
"consumer-side analyses — port as example notebooks, not engine ops").

Each section cites the reference script it mirrors. Run against the
driver testdata:

    python examples/research_analyses.py [--sf /root/testdata/sf0.01]

All analyses are plain DataFrame aggregations/windows — at 100 TB each is
one or two partial-aggregated shuffles; nothing collects more than a
summary to the driver.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(spark=None, sf: str = "/root/testdata/sf0.01") -> None:
    # argparse stays under __main__ (review find: parsing the host
    # process's argv here made main(spark=shared) crash with SystemExit
    # inside any embedder whose argv carries its own flags)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.plans.registry import load

    own_spark = spark is None
    if own_spark:
        spark = get_spark("research-analyses")
    ev = load(spark, sf, "events")

    # -- 1. Daily extremes (phase6b_price_clustering.py:308) ----------------
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    print("daily extremes:", daily.count(), "days")

    # -- 2. Price clustering: round-level concentration
    #       (phase6b_price_clustering.py:556) ------------------------------
    clustered = (
        ev.groupBy(F.round("value", 0).alias("level"))
        .count()
        .orderBy(F.desc("count"))
    )
    top = clustered.first()
    print(f"most-hit price level: {top['level']} ({top['count']} events)")

    # -- 3. Interval quantiles (phase6a_interval_analysis.py:157-216) -------
    w = Window.partitionBy("event_type").orderBy("ts")
    gaps = ev.select(
        "event_type",
        (F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w))
        .alias("gap_s"),
    ).dropna()
    q = gaps.groupBy("event_type").agg(
        F.expr("percentile(gap_s, 0.25)").alias("q25"),
        F.expr("percentile(gap_s, 0.5)").alias("q50"),
        F.expr("percentile(gap_s, 0.99)").alias("q99"),
    )
    print("inter-event gap quantiles:")
    q.show(truncate=False)

    # -- 4. Volatility persistence: lag-1 autocorrelation of |returns|
    #       (phase3_volatility_model.py:159-215) ---------------------------
    rets = ev.select(
        "event_type",
        "ts",
        F.abs(F.col("value") - F.lag("value").over(w)).alias("abs_move"),
    ).dropna()
    persistence = (
        rets.withColumn("prev_move", F.lag("abs_move").over(w))
        .groupBy("event_type")
        .agg(F.corr("abs_move", "prev_move").alias("autocorr"))
    )
    print("volatility persistence (lag-1 autocorr of |moves|):")
    persistence.show(truncate=False)

    # -- 5. Pearson corr between value and user activity
    #       (phase4_statistical_tests.py:137) ------------------------------
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.avg("value").alias("avg_value")
    )
    corr = per_user.agg(F.corr("n_events", "avg_value").alias("r")).first()["r"]
    print(f"corr(user activity, avg value) = {corr:.6f}")

    # -- 6. Chow test for structural break
    #       (phase4_statistical_tests.py:136-242) --------------------------
    # The reference tests whether a monthly model metric shifts regime at
    # a chosen breakpoint: a mean-only (k=1) Chow test,
    #   F = [(SSR_pooled − (SSR_1+SSR_2)) / k] / [(SSR_1+SSR_2) / (n1+n2−2k)]
    # over ≥3 observations per side. The reference's observation unit is
    # a month of model results; the driver fixture spans one month, so
    # the unit here is a DAY of mean |move| (volatility proxy) — the
    # break machinery is identical. The breakpoint splits the observed
    # days in half. Everything is two groupBy().agg() passes —
    # per-period SSR comes from the sufficient statistics Σx, Σx², n
    # (SSR = Σx² − n·mean²), so only a handful of scalars ever reach
    # the driver regardless of corpus size.
    daily_vol = (
        ev.select(
            F.to_date("ts").alias("day"),
            F.abs(F.col("value") - F.lag("value").over(w)).alias(
                "abs_move"
            ),
        )
        .dropna()
        .groupBy("day")
        .agg(F.avg("abs_move").alias("metric"))
    )
    days = sorted(r["day"] for r in daily_vol.select("day").collect())
    if len(days) < 6:
        print(
            f"Chow test: skipped — need >=3 days per period, "
            f"have {len(days)}"
        )
    else:
        bp = days[len(days) // 2]
        stats = (
            daily_vol.withColumn(
                "period", F.when(F.col("day") < F.lit(bp), 1).otherwise(2)
            )
            .groupBy("period")
            .agg(
                F.count("*").alias("n"),
                F.sum("metric").alias("s"),
                F.sum(F.col("metric") * F.col("metric")).alias("ss"),
            )
            .collect()
        )
        by_p = {r["period"]: r for r in stats}
        n1, n2 = by_p[1]["n"], by_p[2]["n"]
        ssr1 = by_p[1]["ss"] - by_p[1]["s"] ** 2 / n1
        ssr2 = by_p[2]["ss"] - by_p[2]["s"] ** 2 / n2
        n, s, ss = (
            n1 + n2,
            by_p[1]["s"] + by_p[2]["s"],
            by_p[1]["ss"] + by_p[2]["ss"],
        )
        ssr_pooled = ss - s**2 / n
        k = 1  # intercept-only model, as in the reference
        denom = (ssr1 + ssr2) / (n - 2 * k)
        if denom <= 0:
            print("Chow test: no within-period variance — degenerate")
        else:
            f_stat = (ssr_pooled - (ssr1 + ssr2)) / k / denom
            p = _f_sf(f_stat, k, n - 2 * k)
            m1, m2 = by_p[1]["s"] / n1, by_p[2]["s"] / n2
            print(
                f"Chow test @ {bp:%Y-%m-%d}: F={f_stat:.4f}, p={p:.4f}, "
                f"mean before={m1:.6f} after={m2:.6f}, "
                f"regime_shift={p < 0.05}"
            )

    print("research analyses done")
    if own_spark:
        spark.stop()


def _f_sf(f: float, d1: int, d2: int) -> float:
    """Survival function 1 − CDF of the F(d1, d2) distribution via the
    regularized incomplete beta: sf = I_{d2/(d2+d1·f)}(d2/2, d1/2).
    Driver-side scalar math on a handful of aggregates (the reference
    reaches for scipy.stats.f.cdf; this container has no scipy, and the
    continued-fraction Lentz evaluation below is the textbook route)."""
    import math

    if f <= 0:
        return 1.0
    x = d2 / (d2 + d1 * f)
    a, b = d2 / 2.0, d1 / 2.0

    def betainc_reg(a: float, b: float, x: float) -> float:
        if x <= 0:
            return 0.0
        if x >= 1:
            return 1.0
        ln_front = (
            math.lgamma(a + b)
            - math.lgamma(a)
            - math.lgamma(b)
            + a * math.log(x)
            + b * math.log1p(-x)
        )
        # continued fraction converges fastest for x < (a+1)/(a+b+2);
        # otherwise use the symmetry I_x(a,b) = 1 − I_{1−x}(b,a). STRICT
        # inequality (review find): at x exactly on the threshold with
        # a == b, both the original and the mirrored call satisfy a >=
        # test and mutually recurse forever (_f_sf(1.0, 2, 2) crashed);
        # the CF still converges fine exactly at the switchover.
        if x > (a + 1) / (a + b + 2):
            return 1.0 - betainc_reg(b, a, 1.0 - x)
        # modified Lentz's method for the CF of I_x(a, b)
        tiny = 1e-300
        c, d = 1.0, 1.0 - (a + b) * x / (a + 1)
        d = 1.0 / (d if abs(d) > tiny else tiny)
        h = d
        for m in range(1, 200):
            m2 = 2 * m
            num = m * (b - m) * x / ((a + m2 - 1) * (a + m2))
            d = 1.0 + num * d
            d = 1.0 / (d if abs(d) > tiny else tiny)
            c = 1.0 + num / (c if abs(c) > tiny else tiny)
            h *= d * c
            num = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1))
            d = 1.0 + num * d
            d = 1.0 / (d if abs(d) > tiny else tiny)
            c = 1.0 + num / (c if abs(c) > tiny else tiny)
            delta = d * c
            h *= delta
            if abs(delta - 1.0) < 1e-12:
                break
        return math.exp(ln_front) * h / a

    return min(max(betainc_reg(a, b, x), 0.0), 1.0)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    main(sf=ap.parse_args().sf)
