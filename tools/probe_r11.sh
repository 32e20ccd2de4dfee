#!/bin/bash
# Round-11 scale probes: solo (chunk=1) walls for the rows converted to
# store reads this round, at 64x and 128x, same protocol as the SURVEY
# growth tables (one warm JVM per sbt run, fresh session per query,
# warmup + min-of-2). Builder-side tooling.
set -u
OUT=${1:-/tmp/probe_r11}
mkdir -p "$OUT"
for SF in /tmp/sf0.1x64 /tmp/sf0.1x128; do
  TAG=$(basename "$SF")
  for q in dedup_leakage_split dedup_filtered_corpus dedup_threshold_curve \
           dedup_clusters mm_phash_clusters_indexed mm_phash_clusters; do
    SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_CHUNK=1 \
      SPARK_GRAFT_ONLY="^$q\$" SPARK_GRAFT_BENCH_OUT="$OUT/${TAG}_$q.json" \
      sbt -batch "runMain graft.Bench" 2>/dev/null |
      grep -o '{"metric".*}' > /dev/null
    echo "== $TAG $q"; cat "$OUT/${TAG}_$q.json"
  done
done
