"""Interleaved A/B of the `_wide` scan-width rule on tx02/tx07/q54
(VERDICT r13 #1: the three wrong-direction regressions of the r13 round).

A = current query (with `_wide`), B = identical query without the
round-robin repartition. Reps interleave A,B,A,B,... in ONE session so
box drift hits both arms equally (the r13 honesty protocol).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from kafkatosparktokudu_spark.functions.exact import (
        MONEY, RATE, dec, prod_sum_double,
    )
    from kafkatosparktokudu_spark.operators.text import keyterms, quality_scores
    from kafkatosparktokudu_spark.plans.queries import QUERIES, _t, _wide
    from kafkatosparktokudu_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab_wide_trio")

    def q54_nowide(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem")
        orders = _t(spark, sf_dir, "orders").filter(
            F.col("o_orderdate").between("1996-01-01", "1997-12-31")
        )
        part = _t(spark, sf_dir, "part").filter(
            F.col("p_type") == "ECONOMY").select("p_partkey")
        supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        nat_c = _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_regionkey").alias("cn_region"))
        nat_s = _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"))
        region = _t(spark, sf_dir, "region").filter(
            F.col("r_name") == "EUROPE").select("r_regionkey")
        vol = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"), RATE)
        joined = (
            li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nat_c), F.col("c_nationkey") == F.col("cn_key"))
            .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
            .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nat_s), F.col("s_nationkey") == F.col("sn_key"))
        )
        return (
            joined.groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(
                (prod_sum_double(
                    F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)))
                 / prod_sum_double(F.sum(vol))).alias("mkt_share")
            )
        )

    variants = {
        "tx02": (
            QUERIES["tx02_quality_scores"],
            lambda s, d: quality_scores(_t(s, d, "documents")),
        ),
        "tx07": (
            QUERIES["tx07_keyterms"],
            lambda s, d: keyterms(_t(s, d, "documents")),
        ),
        "q54": (QUERIES["q54_market_share"], q54_nowide),
    }

    reps = int(os.environ.get("AB_REPS", "5"))
    for name, (fa, fb) in variants.items():
        ta, tb = [], []
        # one untimed warmup each
        for f in (fa, fb):
            f(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for i in range(reps):
            for tag, f, acc in (("A", fa, ta), ("B", fb, tb)):
                spark.catalog.clearCache()
                spark._jvm.System.gc()
                spark.sparkContext.setJobDescription(f"ab:{name}:{tag}{i}")
                t0 = time.time()
                f(spark, sf_dir).write.format("noop").mode("overwrite").save()
                acc.append(round(time.time() - t0, 3))
        med = lambda xs: sorted(xs)[len(xs) // 2]
        print(f"{name}: wide median {med(ta):.3f} reps={ta}")
        print(f"{name}: plain median {med(tb):.3f} reps={tb}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
