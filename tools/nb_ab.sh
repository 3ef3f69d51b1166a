#!/usr/bin/env bash
# Non-broadcast certification A/B (round 14, verdict item #3): time the
# join family TWICE at the same sf dir — the default regime (dimension
# build sides broadcast) vs SPARK_GRAFT_NO_BROADCAST=1 (planner threshold
# -1 AND graft.operators.Tuning drops every explicit broadcast hint the
# join operators place), so the SMJ/shuffled-hash fallback the 100 TB
# story assumes gets a measured row per query instead of an untimed code
# path. PlanShapeSpec pins both the fallback plan shape (equi-join, never
# nested-loop) and row-for-row result parity between the regimes; this
# script adds the TIMING leg and writes a single merged artifact:
#
#   BENCH_nb_ab_<sf>.json  {"sf":…,"broadcast":<leg>,"no_broadcast":<leg>,
#                           "ratio":{q:nb/b,…}}
#
# Family default = the six join-family queries (dimension join both
# on_error modes, as-of, range, salted, interval). Filtered Bench runs
# never write canonical snapshots, so neither leg can clobber the
# committed broadcast-regime numbers.
#
# Usage: SPARK_GRAFT_SF_DIR=target/sf10 tools/nb_ab.sh
set -euo pipefail
cd "$(dirname "$0")/.."
: "${SPARK_GRAFT_SF_DIR:?set SPARK_GRAFT_SF_DIR}"
FAMILY="${SPARK_GRAFT_NB_FAMILY:-q17_join_warn,q18_join_nullpad,q57_asof_join,q58_range_join,q77_salted_join,q156_interval_join}"
export SPARK_GRAFT_BENCH_ONLY="$FAMILY"
echo "[nb_ab] leg A (broadcast) at $SPARK_GRAFT_SF_DIR" >&2
A=$(sbt -error -batch "runMain graft.Bench" | grep -E '^\{"queries"' | tail -1)
echo "[nb_ab] leg B (no-broadcast) at $SPARK_GRAFT_SF_DIR" >&2
B=$(SPARK_GRAFT_NO_BROADCAST=1 sbt -error -batch "runMain graft.Bench" | grep -E '^\{"queries"' | tail -1)
python3 - "$A" "$B" <<'EOF'
import json, os, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
assert b.get("no_broadcast") is True, "leg B did not run in the no-broadcast regime"
assert not a.get("errors") and not b.get("errors"), (a.get("errors"), b.get("errors"))
sf = os.path.basename(a["sf"].rstrip("/"))
ratio = {q: round(b["queries"][q] / a["queries"][q], 2)
         for q in a["queries"] if q in b["queries"] and a["queries"][q] > 0}
out = {"sf": a["sf"], "broadcast": a, "no_broadcast": b, "ratio": ratio}
path = f"BENCH_nb_ab_{sf}.json"
with open(path, "w") as f:
    f.write(json.dumps(out) + "\n")
print(f"[nb_ab] wrote {path}: ratios {ratio}")
EOF
