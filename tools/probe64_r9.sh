#!/bin/bash
# Round-9 new-row scale probes: solo (chunk=1) walls at 64x, same protocol
# as the SURVEY growth tables (one warm JVM per sbt run, fresh session per
# query, warmup + min-of-2). Builder-side tooling.
set -u
SF=${1:-/tmp/sf0.1x64}
OUT=${2:-/tmp/probe64_r9}
mkdir -p "$OUT"
for q in dedup_soft_weights dedup_proto_prune dedup_cluster_canonical \
         dedup_sig_jaccard sim_matryoshka_recall evt_kmv_overlap \
         mm_phash_clusters; do
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_CHUNK=1 \
    SPARK_GRAFT_ONLY="^$q\$" \
    sbt -batch "runMain graft.Bench" 2>/dev/null |
    grep -o '{"metric".*}' > "$OUT/$q.json"
  cat "$OUT/$q.json"
done
