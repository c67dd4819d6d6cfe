#!/usr/bin/env python3
"""Isolated-protocol PySpark re-measurement of three BASELINE.md queries.

Round-7 perf forensics (VERDICT r6 item 1): the 14-query baseline table was
measured with all queries in ONE warm session, so its per-row numbers do not
include cold-JVM first-touch costs (parquet footer reads + codegen compile).
To compare an *isolated* single-query run of the Scala engine fairly, this
script measures the SAME queries in PySpark under the identical isolated
protocol used by `graft.Bench` with SPARK_GRAFT_ONLY + SPARK_GRAFT_REPEAT:
fresh process, local[4], shuffle=4, UTC, UI off, the same neutral warm-up
(no table reads), then the one query executed 3x (execution #1 = cold
first-touch; #2/#3 = steady-state plan cost).

Usage: python3 tools/isobaseline.py {topk|text_stats|time_tumbling}
Prints one JSON line per run: {"query": ..., "runs_sec": [c, w, w]}
"""
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

# Neutral warm-up — mirrors graft.Bench: JVM/codegen/shuffle/broadcast
# machinery only, deliberately no table reads.
w = spark.range(1000000).select(F.col("id"), (F.col("id") % 97).alias("k"))
(
    w.groupBy("k")
    .count()
    .join(F.broadcast(spark.range(97).select(F.col("id").alias("k"))), "k")
    .orderBy(F.col("count").desc())
    .limit(5)
    .count()
)


def q_topk():
    return (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def q_text_stats():
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
            (F.sum(F.size(F.split("text", " "))).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


def q_time_tumbling():
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # round-6 fixtures: ts is TIMESTAMP_NTZ; cast under the UTC session
    # (same handling as graft.Tables.events).
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .orderBy("window", "event_type")
    )


QUERIES = {"topk": q_topk, "text_stats": q_text_stats, "time_tumbling": q_time_tumbling}

name = sys.argv[1]
runs = []
for _ in range(3):
    t0 = time.time()
    QUERIES[name]().count()
    runs.append(round(time.time() - t0, 3))
print(json.dumps({"query": name, "runs_sec": runs}))
spark.stop()
