"""Order-controlled A/B: default (HDFS-backed) vs RocksDB state-store
provider on the two state-store-commit-floor streaming entries
(VERDICT r11 next #6).  Alternates variants (d, r, d, r) per entry so
JVM warm-up lands on both sides (the r11 expiry-knob lesson: the first
run pays warm-up), and checks the output relation is IDENTICAL across
providers (sorted-row md5) before any timing is believed."""
import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
DEFAULT = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
SF = "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from spark_gp_spark import queries as Q

ENTRIES = ["streaming_neardup_expiry", "streaming_neardup_join_bounded"]


def run(name, provider):
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    t0 = time.time()
    df = Q.QUERIES[name](spark, SF)
    rows = df.collect()
    dt = time.time() - t0
    dig = hashlib.md5(
        "\n".join(sorted(repr(tuple(r)) for r in rows)).encode()
    ).hexdigest()[:12]
    spark.catalog.clearCache()
    return round(dt, 2), len(rows), dig


out = {}
for name in ENTRIES:
    seq = []
    for i, prov in enumerate([DEFAULT, ROCKS, DEFAULT, ROCKS, DEFAULT, ROCKS]):
        try:
            dt, n, dig = run(name, prov)
        except Exception as e:
            seq.append({"prov": prov.split(".")[-1], "err": f"{type(e).__name__}: {e}"[:300]})
            continue
        seq.append({"prov": prov.split(".")[-1], "s": dt, "rows": n, "md5": dig})
    out[name] = seq
    print(name, json.dumps(seq), flush=True)

print("RESULT " + json.dumps(out))
