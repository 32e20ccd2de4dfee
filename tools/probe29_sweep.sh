#!/bin/bash
# Probe 29 (round 11): mutated-64x oracle replay of the text-reading
# families, two-phase. Phase 1 sends the rows probe 27 proved one-shot
# DuckDB-infeasible (recursive closures, unrolled graph rounds, giant
# posting joins) STRAIGHT to scale mode (tools/scale_check.py); phase 2
# re-runs the previously-green rows through the plain one-shot checker.
# Shards run concurrently (6-way, the probe-27 protocol). Builder tooling.
set -u
SF=${1:-/tmp/sf0.1x64m}
OUT=${2:-/tmp/verify_x64m}
RESDIR=${3:-/tmp/probe29}
TMO_SCALE=${4:-1200}
TMO_FAST=${5:-600}
mkdir -p "$RESDIR"

SCALE_ROWS="dedup_clusters dedup_clusters_indexed dedup_cluster_canonical \
dedup_filtered_corpus dedup_leakage_split dedup_soft_weights \
dedup_edit_distance dedup_exact_substr dedup_simhash \
graph_common_neighbors graph_kcore graph_label_prop graph_pagerank \
graph_triangles txt_cdc_chunking txt_curation_funnel mm_phash_clusters_indexed"

run_scale() {
  local q=$1
  local r
  r=$(GRAFT_ONLY="^$q\$" GRAFT_DUCK_TMP="/tmp/duckspill_$q" \
      timeout "$TMO_SCALE" python3 tools/scale_check.py "$SF" "$OUT" 2>&1 |
      grep -E "^(PASS|FAIL) $q" | head -1)
  if [ -z "$r" ]; then echo "TIMEOUT $q (scale ${TMO_SCALE}s)"
  else echo "SCALE-$r"; fi
  rm -rf "/tmp/duckspill_$q"
}

run_fast() {
  local q=$1
  local r
  r=$(GRAFT_ONLY="^$q\$" timeout "$TMO_FAST" python3 tools/check.py "$SF" "$OUT" 2>&1 |
      grep -E "^(PASS|FAIL) $q" | head -1)
  if [ -z "$r" ]; then echo "TIMEOUT $q (${TMO_FAST}s)"
  else echo "$r"; fi
}

export -f run_scale run_fast
export SF OUT TMO_SCALE TMO_FAST

# phase 1: scale-mode rows, 6-way parallel
echo "$SCALE_ROWS" | tr ' ' '\n' | grep -v '^$' |
  xargs -P 6 -I{} bash -c 'run_scale {}' > "$RESDIR/phase1.txt"
cat "$RESDIR/phase1.txt"

# phase 2: remaining text-reading rows (dedup/txt/mm/graph/hyb), one-shot
python3 - <<EOF > "$RESDIR/phase2_names.txt"
import json, re
skip = set("""$SCALE_ROWS""".split())
names = sorted(q for q in json.load(open("$OUT/oracle_sql.json"))
               if re.match(r"^(dedup_|txt_|mm_|graph_|hyb_)", q) and q not in skip)
print("\n".join(names))
EOF
xargs -P 6 -I{} bash -c 'run_fast {}' < "$RESDIR/phase2_names.txt" \
  > "$RESDIR/phase2.txt"
cat "$RESDIR/phase2.txt"

cat "$RESDIR/phase1.txt" "$RESDIR/phase2.txt" > "$RESDIR/all.txt"
echo "---- summary ----"
for k in "SCALE-PASS" "PASS" "SCALE-FAIL" "FAIL" "TIMEOUT"; do
  printf "%s: %s\n" "$k" "$(grep -c "^$k" "$RESDIR/all.txt")"
done
