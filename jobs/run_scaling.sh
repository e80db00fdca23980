#!/bin/bash
# North-rule scaling evidence: the SAME job at two parallelism levels
# (local[N] vs local[4N], CPU-pinned), plus a host-ceiling calibration so
# sub-linear rows can be attributed to the box, not the engine.
#
# Measurement rules (hard-won):
# - taskset pins each leg to exactly its core budget — JVM task threads and
#   python workers otherwise spill onto idle host cores and overstate the
#   small leg.
# - the task grid (shuffle partitions, input partitions) is FIXED across
#   legs (jobs/scaling.py N_PART): identical plans, only scheduler
#   parallelism varies. r1's cores-proportional partitioning made the small
#   leg spill (super-linear 8.98x pip artifact).
# - jobs/host_calibration.py measures what this host can deliver N->4N for
#   ALU-bound vs DRAM-bound kernels: the cores are real vCPUs but SHARE
#   memory controllers, so memory-heavy kernels cap below 1.0 on ONE box.
#   On a real cluster 4N executors bring 4N memory controllers, so the
#   mem-normalized column is the cluster-relevant number.
set -e
cd /root/repo
N=${1:-2}
N4=$((N * 4))
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
PAGES=${2:-96000}
REP=${3:-16}

echo "host calibration (pure python, no Spark) ..."
CAL=$(python jobs/host_calibration.py "$N" "$N4" 2>/dev/null | tail -1)
echo "$CAL"
echo "running cores=$N4 (taskset 0-$((N4-1))) ..."
J4=$(taskset -c 0-$((N4-1)) python jobs/scaling.py "$N4" "$SF" "$PAGES" "$REP" 2>/dev/null | tail -1)
echo "$J4"
echo "running cores=$N (taskset 0-$((N-1))) ..."
J1=$(taskset -c 0-$((N-1)) python jobs/scaling.py "$N" "$SF" "$PAGES" "$REP" 2>/dev/null | tail -1)
echo "$J1"

python - "$J1" "$J4" "$CAL" <<'EOF'
import json, sys, datetime
j1, j4, cal = json.loads(sys.argv[1]), json.loads(sys.argv[2]), json.loads(sys.argv[3])
n, n4 = j1["cores"], j4["cores"]
# dominant kernel class per workload (for host-ceiling normalization)
klass = {
    "normalize": "alu",   # python string/XML parsing, small working set
    "pip_join": "mem",    # Arrow transfer + pandas/numpy refine, DRAM-bound
    "tiles": "mem",       # 24M-row shuffle hash agg
    "knn": "mem",         # shuffled candidates + window over 126M rows
    "total": "mem",
}
lines = [
    "# BENCH/BASELINE.md — measured scaling (north rule: efficiency >= 0.8 from N to 4N)",
    "",
    f"Generated {datetime.date.today().isoformat()} by jobs/run_scaling.sh on local[{n}] vs local[{n4}]",
    "(sandbox proxy for N vs 4N executors; both legs CPU-pinned, identical task grid).",
    "",
    "## Host ceiling (jobs/host_calibration.py — pure python, no Spark)",
    "",
    f"| kernel class | {n}c sec | {n4}c sec | throughput scaling | ceiling efficiency |",
    "|---|---|---|---|---|",
]
for k in ("alu", "mem"):
    c = cal[k]
    lines.append(
        f"| {k} | {c['t_n']} | {c['t_n4']} | {c['throughput_x']:.2f}x | {c['efficiency']:.2f} |"
    )
lines += [
    "",
    "The pinned cores are distinct vCPUs (no SMT pairing) but share the",
    "memory controllers: DRAM-bound kernels cap at the `mem` ceiling on one",
    "box. On a real cluster, 4N executors bring 4N memory controllers — the",
    "normalized column below is the cluster-relevant efficiency.",
    "",
    "## Workloads",
    "",
    f"| workload | rows | local[{n}] sec | local[{n4}] sec | speedup | efficiency | kernel class | host-normalized |",
    "|---|---|---|---|---|---|---|---|",
]
for k in ["normalize", "pip_join", "tiles", "knn", "total"]:
    t1, t4 = j1["seconds"][k], j4["seconds"][k]
    rows = j1["rows"].get("pages" if k == "normalize" else "points", "")
    sp = t1 / t4 if t4 else float("nan")
    eff = sp / (n4 / n)
    ceil = cal[klass[k]]["efficiency"]
    lines.append(
        f"| {k} | {rows} | {t1} | {t4} | {sp:.2f}x | {eff:.2f} | {klass[k]} | {min(eff / ceil, 1.0):.2f} |"
    )
t1, t4 = j1["seconds"]["total"], j4["seconds"]["total"]
eff = (t1 / t4) / (n4 / n)
lines += [
    "",
    f"**Total throughput scaling efficiency {n} -> {n4} cores: {eff:.2f} raw, "
    f"{min(eff / cal['mem']['efficiency'], 1.0):.2f} host-normalized.**",
    "",
    "Raw JSON:",
    "```json",
    json.dumps(cal),
    json.dumps(j1),
    json.dumps(j4),
    "```",
]
open("BENCH/BASELINE.md", "w").write("\n".join(lines) + "\n")
print("wrote BENCH/BASELINE.md; total raw efficiency:", round(eff, 3))
EOF
