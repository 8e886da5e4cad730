"""Subprocess driver for the V2-catalog mergeInto commit test.

Runs in a FRESH JVM (spark.driver.extraClassPath must be set at
launch, so the shared test session cannot be reused): registers the
in-memory row-level-operation catalog (jvm/sparkgraft/mem/
MemCatalog.java) and asserts commit_upsert's PRIMARY branch commits —
committed_via == "mergeInto", never the V1 rewrite fallback — and that
the committed table state equals the q_merge_upsert plan output.

Usage: python tests/memcat_driver.py <classes_dir>
Exits 0 on success; any assertion/exception exits non-zero.
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession


def main() -> None:
    classes_dir = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.driver.extraClassPath", classes_dir)
        .config("spark.sql.catalog.memcat", "sparkgraft.mem.MemCatalog")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("memcat-merge-driver")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sparkstreamingtohdfsofsensorsdata_spark.operators.merge import (
        commit_upsert,
        q_merge_upsert,
    )

    sf = "/root/testdata/sf0.001"
    expected = sorted(
        tuple(r) for r in q_merge_upsert(spark, sf).drop("op").collect()
    )
    back = commit_upsert(spark, sf, table="memcat.ns.customer_upsert")
    got = sorted(
        tuple(r)
        for r in back.select(
            "c_custkey", "c_name", "c_mktsegment", "bal_cents"
        ).collect()
    )
    assert commit_upsert.committed_via == "mergeInto", (
        f"expected the PRIMARY mergeInto branch on the V2 catalog, "
        f"got {commit_upsert.committed_via!r}"
    )
    assert got == expected, (
        f"mergeInto-committed state diverges from the join-rewrite plan: "
        f"{len(got)} vs {len(expected)} rows"
    )
    print(f"memcat merge commit OK: {len(got)} rows via mergeInto")


main()
