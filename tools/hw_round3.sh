#!/bin/bash
# Round-3 on-hardware measurement sequence (run DETACHED: nohup bash
# tools/hw_round3.sh > /tmp/hw_r3.log 2>&1 &  — never timeout-kill a
# TPU-driving process, see .claude/skills/verify/SKILL.md wedge protocol).
#
# Sequential stages, each sized to minutes; poll /tmp/hw_r3.log.
set -u
cd "$(dirname "$0")/.."
echo "=== hw_round3 start $(date) ==="

echo "=== stage 1: tpu_check (hardware exactness incl. fused Gram) ==="
python tools/tpu_check.py 2>&1
echo "=== tpu_check rc=$? $(date) ==="

echo "=== stage 2: bench_gram (fused-Gram burst perf, 1.68 GB) ==="
python tools/bench_gram.py 2>&1
echo "=== bench_gram rc=$? $(date) ==="

echo "=== stage 3: bench_burst (standalone kernel rates for ROOFLINE) ==="
python tools/bench_burst.py 2>&1
echo "=== bench_burst rc=$? $(date) ==="

echo "=== stage 4: bench.py (configs A, B, Bm, X) ==="
BENCH_WAIT_TPU_S=60 python bench.py 2>&1
echo "=== bench rc=$? $(date) ==="

echo "=== stage 5: bench_engines (all engine families at 3.36 GB, scan mode) ==="
python tools/bench_engines.py 2>&1
echo "=== bench_engines rc=$? $(date) ==="

echo "=== stage 6: bench_quality (biobank-scale inference quality, 10.74 GB) ==="
python tools/bench_quality.py both 2>&1
echo "=== bench_quality rc=$? $(date) ==="

echo "=== hw_round3 done $(date) ==="
