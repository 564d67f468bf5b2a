#!/bin/bash
# Round-3 TPU measurement batch: run when the axon tunnel is healthy.
# Produces every number VERDICT r2 asked for, in dependency order, with
# per-step timeouts so one wedged dispatch cannot eat the session.
#
#   bash tools/tpu_r3_measure.sh [outdir]
#
# Steps:
#   1. kernel microbench (fused/int4/int4a8/int5/int6/int8/int8a8/bf16 + MLP)
#   2. int8 decode A/B: default vs EXL3_TPU_MLP=fused vs EXL3TPU_INT8_ACTQ=1
#      (the 87% -> 92% hunt: fewer launches / int8 MXU feed)
#   3. full bench.py (serving p50/p95, int4, int6, fused, mla, moe sections)
#   4. conversion wall-clock (0.1b geometry on-device)
set -u
OUT=${1:-/tmp/tpu_r3_measure}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "== $name (timeout ${to}s) =="
  timeout "$to" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -5 "$OUT/$name.log"
  echo "== $name done rc=$rc =="
}

run probe 240 python -c "import jax, numpy as np, jax.numpy as jnp; \
print(jax.devices()); print(np.asarray(jnp.zeros((2,))+1))"
grep -q "^\[" "$OUT/probe.log" || { echo "TPU unreachable; aborting"; exit 1; }

run kernels 3600 python bench_kernels.py

# decode-only A/B at 8B geometry (bench section filter keeps it fast)
run decode_default 3600 env EXL3TPU_BENCH_MODE=none python bench.py
run decode_fusedmlp 3600 env EXL3TPU_BENCH_MODE=none EXL3_TPU_MLP=fused \
    python bench.py
run decode_actq 3600 env EXL3TPU_BENCH_MODE=none EXL3TPU_INT8_ACTQ=1 \
    python bench.py

run bench_full 7200 python bench.py

run convert_0p1b 7200 python eval/convert_bench.py --size 0.1b

echo "all logs in $OUT"
