"""Probe: does Python replicate Spark's ROUND(log2(u/t), 6) bit-for-bit?

Spark's LOG2 is java.lang.Math.log(x)/0.6931... via StrictMath/intrinsic;
Python's math.log(x)/math.log(2) goes through C libm. Both are <=1ulp from
the exact value but NOT guaranteed identical. The 6dp HALF_UP round after
makes a divergence visible only when the two doubles straddle a .5e-6
boundary. This probe measures the raw-double mismatch rate and the
rounded-value mismatch rate over a wide sample of (uses, total) pairs of
the shapes the unigram trainer produces.
"""
import math
import random
from decimal import Decimal, ROUND_HALF_UP

from pyspark.sql import functions as F

from spark_relieffc_fselection_spark import get_spark


def py_round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1E-6"), rounding=ROUND_HALF_UP))


def main() -> None:
    spark = get_spark(shuffle_partitions=8)
    rng = random.Random(20260817)
    pairs = []
    # trainer-shaped inputs: uses in [1, 1e9], total >= uses
    for _ in range(200_000):
        u = rng.randint(1, 10**rng.randint(0, 9))
        t = u + rng.randint(0, 10**rng.randint(0, 9))
        pairs.append((u, float(t)))
    df = spark.createDataFrame(pairs, "u long, t double")
    rows = df.select(
        "u", "t",
        F.log2(F.col("u") / F.col("t")).alias("raw"),
        F.round(F.log2(F.col("u") / F.col("t")), 6).alias("r6"),
    ).collect()
    raw_mm = r6_mm = 0
    worst = None
    for r in rows:
        py_raw = math.log(r["u"] / r["t"]) / math.log(2.0)
        if py_raw != r["raw"]:
            raw_mm += 1
            if worst is None:
                worst = (r["u"], r["t"], r["raw"], py_raw)
        if py_round6(py_raw) != r["r6"]:
            r6_mm += 1
            print("ROUNDED MISMATCH", r["u"], r["t"], r["raw"], py_raw, r["r6"], py_round6(py_raw))
    # also try math.log2 directly
    l2_raw_mm = sum(1 for r in rows if math.log2(r["u"] / r["t"]) != r["raw"])
    print(f"samples={len(rows)} raw_mismatch(log/log2op)={raw_mm} raw_mismatch(math.log2)={l2_raw_mm} rounded6_mismatch={r6_mm}")
    if worst:
        print("first raw mismatch:", worst)
    spark.stop()


if __name__ == "__main__":
    main()
