#!/bin/bash
cd /root/repo
status() { echo "$1 $(date -u +%H:%M:%S)" >> .compare/chain_status; }
retry() { # retry <n> <timeout> <log> <cmd...>
  local n=$1 to=$2 log=$3; shift 3
  for i in $(seq 1 $n); do
    timeout $to "$@" >> "$log" 2>&1 && return 0
    echo "retry $i rc=$?" >> "$log"; sleep 20
  done; return 1
}
# 1. triplane smoke @600 with wd + volume sparsity (new code)
retry 3 3000 .compare/tri600.log python scripts/compare_backbones.py \
  --backbone triplane --iters 600 --chunk 60 --out .compare/tri600.jsonl \
  --state-file .compare/tri600_state.npz --resume
status tri600
# 2. triplane equal-wall-clock @9600
retry 5 4500 .compare/tri9600.log python scripts/compare_backbones.py \
  --backbone triplane --iters 9600 --chunk 120 --out .compare/tri9600.jsonl \
  --state-file .compare/tri9600_state.npz --resume
status tri9600
# 3. hash-field stage-2 step (VERDICT #2)
retry 3 3600 .compare/stage2_hash.log python scripts/profile_stage2_hash.py
status stage2_hash
# 4. multi-view marginal cost (VERDICT #4)
retry 3 5400 .compare/multiview.log python scripts/profile_multiview.py
status multiview
# 5. pre-gather fusion probe (VERDICT #7)
retry 3 2400 .compare/pregather.log python scripts/profile_pregather_fusion.py
status pregather
# 6. headline bench refresh (now with MFU)
retry 2 3600 .compare/bench_r5.log python bench.py
status bench
# 7. render bench refresh
retry 2 2400 .compare/bench_render_r5.log python bench_render.py
status render
status ALL_DONE
