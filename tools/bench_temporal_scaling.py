"""Two-parallelism scaling evidence for the temporal-join family —
a secondary data point beside the flagship capture (BENCH/
BASELINE_r5.md): the SAME asof + range + rollup workload over a
replicated events table at two core counts, plus a determinism gate
(result hashes identical across levels).

Protocol: levels are INTERLEAVED per rep (level A rep 1, level B
rep 1, level A rep 2, ...) — the host's noise comes in multi-second
windows, so running one level's reps back-to-back biases that whole
level (measured: same-code level bests swung 20.2s vs 26.4s between
runs of the level-blocked variant).  The replicated input is
materialized ONCE as 32-file parquet on tmpfs (short capture span,
identical layout at every level, REAL planner statistics); one
Spark session per (level, rep) reads it.  Reports per-pair
efficiencies AND the best-of efficiency, all reps published.

NOTE the regime (see BENCH/R5_NOTES.md): this workload is
shuffle/sort-bound, not per-core-CPU-bound like the flagship — on a
single shared-memory-bus sandbox box the levels contend for
bandwidth, so raw numbers here are a lower bound on what a real
multi-node cluster (independent memory + disks per node) would show.

Usage: python tools/bench_temporal_scaling.py [--reps 3]
       [--replicate 200] [--cores 2 8]
Prints one JSON line — copy into BENCH/R5_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


INPUT_DIR = "/dev/shm/temporal_scale_input"


def materialize_input(replicate: int, sf_dir: str) -> None:
    """Build the replicated input ONCE as a 32-file parquet on tmpfs;
    every (level, rep) session then just reads it.  This keeps each
    capture's wall-span short (a 7-min session-churn capture cannot
    fit inside one clean host window — a mid-capture stall poisoned
    whole reps), gives every level the identical 32-way layout (the
    narrow-parquet trap), and gives the planner REAL file statistics
    — the localCheckpoint variant froze the pre-explode 1.4 MiB
    estimate and broadcast an 8M-row join side.

    Replication spreads keys (user_id re-keyed per copy) so the
    workload scales in keys, not per-key density; the projection
    drops the unused props JSON blob."""
    import shutil

    from pyspark.sql import functions as F

    from ocr_compare_spark.session import get_spark

    shutil.rmtree(INPUT_DIR, ignore_errors=True)
    spark = get_spark(
        app_name="temporal_scale_build", master="local[8]", shuffle_partitions=8
    )
    try:
        ev0 = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
        (
            ev0.select("event_id", "ts", "user_id", "event_type", "value")
            .repartition(32)
            .withColumn(
                "_c", F.explode(F.array(*[F.lit(i) for i in range(replicate)]))
            )
            .withColumn("user_id", F.col("user_id") + F.col("_c") * 1_000_000)
            .drop("_c")
            .write.mode("overwrite")
            .parquet(INPUT_DIR)
        )
    finally:
        spark.stop()


def _load(spark):
    ev = spark.read.parquet(INPUT_DIR)
    return ev, ev.count()


def _work(ev):
    from pyspark.sql import functions as F

    from ocr_compare_spark.operators import temporal

    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error")
    temporal.asof_join(
        clicks, errors, on="user_id", payload=["event_id", "value"],
        tolerance_us=3_600_000_000, tiebreak="event_id",
    ).write.format("noop").mode("overwrite").save()
    ivs = errors.select(
        "event_id", "user_id", "ts",
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp")) + 600_000_000
        ).alias("end_ts"),
    )
    temporal.point_in_interval_join(
        clicks, ivs, on="user_id", point_ts="ts", start_col="ts",
        end_col="end_ts", bucket_us=600_000_000,
    ).write.format("noop").mode("overwrite").save()
    temporal.rollup_timeseries(
        ev.withColumn("cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")),
        "ts", ["event_type"], ["cents"],
    ).write.format("noop").mode("overwrite").save()


def run_once(cores: int, with_hash: bool):
    from pyspark.sql import functions as F

    from ocr_compare_spark.operators import temporal
    from ocr_compare_spark.session import get_spark

    # shuffle partitions = cores: a controlled interleaved A/B of the
    # WHOLE workload showed parts=4x-cores loses (local[8] best 5.13s
    # vs 4.79s; the asof-only win did not generalize — the range
    # join's extra partitions cost more than the window's smaller
    # sort runs save)
    spark = get_spark(
        app_name=f"temporal_scale_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    # byte-light compute-heavy shuffles: AQE size-based coalescing
    # folds them to 1-2 partitions regardless of cores (the repo's
    # documented local-mode trap; A/B at local[8]: range join
    # 10.1s -> 6.9s with coalescing off)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    # belt-and-braces: with the pre-materialized parquet the planner
    # sees real ~GB statistics and picks SMJ on its own, but an
    # earlier localCheckpoint-based variant froze a 1.4 MiB estimate
    # and BROADCAST an 8M-row build side (serial driver hash build;
    # range join local[8] 6.5s -> 2.4s as SMJ) — keep auto-broadcast
    # off so a stats regression can never silently re-plan it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev, n = _load(spark)
        # best-of-2 inside the session: the first run pays JIT /
        # codegen warm-up — a per-session constant, not a scaling
        # property (bench.py's warm best-of-N protocol)
        elapsed = float("inf")
        for _ in range(2):
            t0 = time.time()
            _work(ev)
            elapsed = min(elapsed, round(time.time() - t0, 3))
        h = None
        if with_hash:
            clicks = ev.filter(F.col("event_type") == "click")
            errors = ev.filter(F.col("event_type") == "error")
            # determinism gate WITHOUT collecting millions of match
            # rows to the driver: an order-free aggregate (sum of
            # per-row xxhash64 + count) pins the match multiset
            agg = (
                temporal.asof_join(
                    clicks, errors, on="user_id", payload=["event_id", "value"],
                    tolerance_us=3_600_000_000, tiebreak="event_id",
                )
                .select(
                    F.xxhash64(
                        F.concat_ws(
                            ":",
                            F.col("event_id").cast("string"),
                            F.coalesce(
                                F.col("event_id_r").cast("string"), F.lit("-")
                            ),
                        )
                    ).alias("h")
                )
                # DECIMAL(38,0) sum: a long sum of millions of
                # full-range int64 hashes overflows under ANSI mode
                .agg(
                    F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
                    F.count("*").alias("n"),
                )
                .collect()[0]
            )
            h = f"{agg.s}:{agg.n}"
    finally:
        spark.stop()
    return n, elapsed, h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--replicate", type=int, default=200)
    ap.add_argument("--cores", type=int, nargs=2, default=[2, 8])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    c1, c2 = args.cores

    materialize_input(args.replicate, args.sf_dir)
    try:
        times = {c1: [], c2: []}
        hashes = {}
        n = None
        for rep in range(args.reps):
            for cores in args.cores:
                with_hash = rep == 0
                n, t, h = run_once(cores, with_hash)
                times[cores].append(t)
                if with_hash:
                    hashes[cores] = h
        pair_effs = [
            round((n / t2) / (n / t1) / (c2 / c1), 3)
            for t1, t2 in zip(times[c1], times[c2])
        ]
        best = {c: min(ts) for c, ts in times.items()}
        eff_best = round((n / best[c2]) / (n / best[c1]) / (c2 / c1), 3)
        srt = sorted(pair_effs)
        median = srt[len(srt) // 2]
        print(json.dumps({
            "workload": "temporal family (asof + range + rollup)",
            "rows": n,
            "times": {str(c): ts for c, ts in times.items()},
            "rows_per_sec_best": {str(c): round(n / b, 1) for c, b in best.items()},
            "pair_efficiencies": pair_effs,
            "median_pair_efficiency": median,
            "best_of_efficiency": eff_best,
            "deterministic_across_levels": hashes[c1] == hashes[c2],
        }))
    finally:
        # the x200 input is hundreds of MB of RAM-backed tmpfs — do
        # not leave it resident after the run
        import shutil

        shutil.rmtree(INPUT_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
