#!/bin/bash
# seg_cap / tile-shape sweep of the resident mapping iteration on the real
# TPU (VERDICT r3 #3: "seg_cap scaling at bigger tiles unexplored").
# One resident-optimize program per config (EAGS_MAPBENCH_MODE=resident10
# = the bench's hot path), amortized over 40 iters in one dispatch.
#
# Run from /root/repo with the TPU idle (respect /tmp/BENCH_RUNNING):
#   bash scripts/seg_sweep.sh [n=262144] 2>&1 | tee /tmp/seg_sweep.log
set -u
N=${1:-262144}
cd "$(dirname "$0")/.."
CONFIGS=(
  ""                                       # baseline tile=32 seg=1024 g=8
  "seg_cap=768"
  "seg_cap=1536"
  "tile=64,dup_side=2,seg_cap=1536,group=4"
  "tile=64,dup_side=2,seg_cap=2048,group=4"
  "group=16"
)
# The windowed-rmw configs are only worth timing if the kernel is
# golden-exact ON CHIP (interpret-mode tests can't see DMA ordering).
echo "=== rmw_window on-chip golden check ==="
if PYTHONPATH=/root/repo:/root/.axon_site \
   JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
   JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0 \
   timeout 3600 python scripts/rmw_check.py window; then
  CONFIGS+=(
    "rmw_window=1"                         # retire-on-advance bwd rmw
    "rmw_window=1,seg_cap=1536"
    "rmw_window=1,tile=64,dup_side=2,seg_cap=2048,group=4"
  )
else
  echo "rmw_window GOLDEN CHECK FAILED (rc=$?) — skipping window configs"
fi
for cfg in "${CONFIGS[@]}"; do
  echo "=== EAGS_RCFG='$cfg' ==="
  EAGS_RCFG="$cfg" EAGS_MAPBENCH_MODE=resident10 \
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0 \
  timeout 3600 python scripts/map_bench.py "$N" 40 || echo "FAILED rc=$?"
done

# Tracking pose-contraction backward (PERF.md roadmap #6): on-chip DMA
# gate first, then the tracking-iteration A/B (legacy vs EAGS_POSE_KERNEL).
echo "=== pose-grad kernel on-chip golden check ==="
if PYTHONPATH=/root/repo:/root/.axon_site \
   JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
   JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0 \
   timeout 3600 python scripts/rmw_check.py pose; then
  for pk in 0 1; do
    echo "=== track_bench EAGS_POSE_KERNEL=$pk ==="
    EAGS_POSE_KERNEL=$pk \
    PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
    JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0 \
    timeout 3600 python scripts/track_bench.py "$N" || echo "FAILED rc=$?"
  done
else
  echo "pose-grad GOLDEN CHECK FAILED (rc=$?) — skipping pose timing"
fi
