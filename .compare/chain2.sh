#!/bin/bash
cd /root/repo
status() { echo "$1 $(date -u +%H:%M:%S)" >> .compare/chain_status; }
retry() { local n=$1 to=$2 log=$3; shift 3
  for i in $(seq 1 $n); do
    timeout $to "$@" >> "$log" 2>&1 && return 0
    echo "retry $i rc=$?" >> "$log"; sleep 20
  done; return 1
}
retry 3 3600 .compare/stage2_hash.log python scripts/profile_stage2_hash.py
status stage2_hash
retry 3 5400 .compare/multiview.log python scripts/profile_multiview.py
status multiview
retry 3 2400 .compare/pregather.log python scripts/profile_pregather_fusion.py
status pregather
# triplane quality runs LAST-BUT-ONE: code must be final by the time the
# profilers drain (~40+ min)
retry 3 3000 .compare/tri600.log python scripts/compare_backbones.py \
  --backbone triplane --iters 600 --chunk 60 --out .compare/tri600.jsonl \
  --state-file .compare/tri600s_state.npz --resume
status tri600
retry 5 4500 .compare/tri9600.log python scripts/compare_backbones.py \
  --backbone triplane --iters 9600 --chunk 120 --out .compare/tri9600.jsonl \
  --state-file .compare/tri9600s_state.npz --resume
status tri9600
retry 2 3600 .compare/bench_r5.log python bench.py
status bench
retry 2 2400 .compare/bench_render_r5.log python bench_render.py
status render
status ALL_DONE
