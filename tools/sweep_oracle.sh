#!/bin/bash
# Scale-point oracle sweep: run every dumped query's DuckDB oracle against
# a (possibly replicated / mutated) corpus one query at a time, each under
# a wall timeout, and taxonomize PASS / FAIL / TIMEOUT. Builder-side
# tooling (python/duckdb are driver-side deps).
#
# Usage: tools/sweep_oracle.sh <sfDir> <verifyOutDir> <resultFile> [timeoutSec] [nameRegex]
#
# The per-query subprocess keeps one runaway oracle (recursive-closure /
# per-token list CTEs that are DuckDB-infeasible at 64x+) from sinking the
# sweep: a TIMEOUT row IS the taxonomy, not an error. nameRegex (python re,
# default all) restricts the sweep — the mutated-corpus probes only re-check
# the text-reading families, whose inputs the mutation actually changes.
set -u
SF=$1; OUT=$2; RES=$3; TMO=${4:-300}; NAMES=${5:-.}
: > "$RES"
for q in $(python3 -c "
import json, re
pat = re.compile('$NAMES')
print('\n'.join(sorted(q for q in json.load(open('$OUT/oracle_sql.json'))
                       if pat.search(q))))"); do
  if [ ! -d "$OUT/$q" ]; then
    echo "NODUMP $q" >> "$RES"; continue
  fi
  r=$(GRAFT_ONLY="^$q\$" timeout "$TMO" python3 tools/check.py "$SF" "$OUT" 2>&1 |
    grep -E "^(PASS|FAIL) $q" | head -1)
  if [ -z "$r" ]; then
    # one-shot evaluation infeasible at this scale — retry in SCALE MODE
    # (tools/scale_check.py: CTE-by-CTE temp-table materialization with the
    # canonical recursive closure replaced by iterative min-label
    # propagation — same ground truth, bounded memory, linear rounds)
    r=$(GRAFT_ONLY="^$q\$" timeout $((TMO * 2)) \
      python3 tools/scale_check.py "$SF" "$OUT" 2>&1 |
      grep -E "^(PASS|FAIL) $q" | head -1)
    if [ -z "$r" ]; then echo "TIMEOUT $q (${TMO}s + scale-mode $((TMO * 2))s)" >> "$RES"
    else echo "SCALE-$r" >> "$RES"; fi
  else echo "$r" >> "$RES"; fi
  tail -1 "$RES"
done
echo "---- summary ----" >> "$RES"
grep -c "^PASS" "$RES" | xargs -I{} echo "PASS: {}" >> "$RES"
grep -c "^SCALE-PASS" "$RES" | xargs -I{} echo "SCALE-PASS: {}" >> "$RES"
grep -c "^FAIL" "$RES" | xargs -I{} echo "FAIL: {}" >> "$RES"
grep -c "^SCALE-FAIL" "$RES" | xargs -I{} echo "SCALE-FAIL: {}" >> "$RES"
grep -c "^TIMEOUT" "$RES" | xargs -I{} echo "TIMEOUT: {}" >> "$RES"
tail -6 "$RES"
