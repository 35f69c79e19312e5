#!/bin/bash
# One-shot TPU measurement session: run the moment the tunnel is up.
# Usage: bash benchmarks/tpu_session.sh [outdir]   (default /tmp/tpu_r3)
# Order matters: cheap probes first, then the hot-loop microbench, the
# traced bench solve, the A/B knob runs, and the official bench last
# (so BENCH numbers come from a warm compile cache).
set -u
OUT=${1:-/tmp/tpu_r3}
mkdir -p "$OUT"
cd /root/repo

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "    exit=$? -> $OUT/$name.log"
  tail -3 "$OUT/$name.log" | sed 's/^/    /'
}

run probe        300 python benchmarks/probe_tpu.py
run microbench   900 python benchmarks/microbench_apply.py
run bench_trace 2400 env PADNE_TPU_SOLVE_TRACE=1 python bench.py
# A/B: deep-level slab widening (pinned correct by tests; needs timing)
run bench_deepwide 2400 env PADNE_TPU_DEEP_OFFSETS=24 PADNE_TPU_DEEP_COVERAGE=0.995 python bench.py
# A/B: drop_tol=1e-3 hierarchy (CPU sweep said at-par iterations,
# -13/-29% deep remainders)
run bench_drop3 2400 env PADNE_TPU_DROP_TOL=1e-3 python bench.py
# A/B: legacy host-anchored refinement loop (vs new device-resident)
run bench_hostrefine 2400 env PADNE_TPU_HOST_REFINE=1 python bench.py
# A/B: host anchor for pass 1 (vs f64 device anchor + int16 residues)
run bench_hostanchor 2400 env PADNE_TPU_HOST_ANCHOR=1 python bench.py
# A/B: x64 off entirely (pre-anchor configuration)
run bench_nox64 2400 env PADNE_TPU_X64=0 python bench.py
# A/B: fully lumped V-cycle (2 fewer full-remainder passes/iter;
# CPU-measured +11% iterations at 150k — net win iff remainder-bound)
run bench_cyclelump 2400 env PADNE_TPU_CYCLE_LUMPED=1 python bench.py
# Official number last (warm cache, default knobs)
run bench_final 2400 python bench.py
echo "=== session done; logs in $OUT ==="
