#!/bin/bash
# North-rule scaling evidence: same workload at N and 4N cores.
#
# This sandbox's 32 vCPUs deliver only ~11-18 effective parallel cores for
# CPU-bound work (SMT/burst VM — measured with a pure-python burn kernel:
# 2c/4c/8c scale ~linearly, 16c=11.4 eff, 32c=18.2 eff). N=2 vs 4N=8 sits
# fully inside physical capacity, so it measures the ENGINE's scaling, not
# the host's SMT ceiling. Results -> BENCH/BASELINE.md.
set -e
cd /root/repo
N=${1:-2}
N4=$((N * 4))
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
PAGES=${2:-96000}
REP=${3:-16}

# taskset pins each leg to exactly its core budget: in local mode the JVM
# task threads AND the python UDF workers otherwise spill onto the host's
# idle cores, silently giving the small leg more than N cores and
# understating true scaling.
echo "running cores=$N4 (taskset 0-$((N4-1))) ..."
J4=$(taskset -c 0-$((N4-1)) python jobs/scaling.py "$N4" "$SF" "$PAGES" "$REP" 2>/dev/null | tail -1)
echo "$J4"
echo "running cores=$N (taskset 0-$((N-1))) ..."
J1=$(taskset -c 0-$((N-1)) python jobs/scaling.py "$N" "$SF" "$PAGES" "$REP" 2>/dev/null | tail -1)
echo "$J1"

python - "$J1" "$J4" <<'EOF'
import json, sys, datetime
j1, j4 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
n, n4 = j1["cores"], j4["cores"]
lines = [
    "# BENCH/BASELINE.md — measured scaling (north rule: efficiency >= 0.8 from N to 4N)",
    "",
    f"Generated {datetime.date.today().isoformat()} by jobs/run_scaling.sh on local[{n}] vs local[{n4}]",
    f"(sandbox proxy for N vs 4N executors; host effective-core ceiling documented in the script).",
    "",
    "| workload | rows | local[%d] sec | local[%d] sec | speedup | efficiency |" % (n, n4),
    "|---|---|---|---|---|---|",
]
for k in ["normalize", "pip_join", "tiles", "knn", "total"]:
    t1, t4 = j1["seconds"][k], j4["seconds"][k]
    rows = j1["rows"].get("pages" if k == "normalize" else "points", "")
    sp = t1 / t4 if t4 else float("nan")
    lines.append(f"| {k} | {rows} | {t1} | {t4} | {sp:.2f}x | {sp/4:.2f} |")
t1, t4 = j1["seconds"]["total"], j4["seconds"]["total"]
lines += [
    "",
    f"**Total throughput scaling efficiency {n} -> {n4} cores: {(t1/t4)/4:.2f}**",
    "",
    "Raw JSON:",
    "```json",
    json.dumps(j1),
    json.dumps(j4),
    "```",
]
open("BENCH/BASELINE.md", "w").write("\n".join(lines) + "\n")
print("wrote BENCH/BASELINE.md; total efficiency:", round((t1/t4)/4, 3))
EOF
