#!/bin/bash
# Run the backbone-quality comparison to completion, resilient to the
# remote TPU worker's UNAVAILABLE faults: per-backbone processes,
# per-chunk state checkpoints, bounded retries with resume.
cd /root/repo
for bb in triplane hash; do
  out=.compare/${bb}.jsonl
  st=.compare/${bb}_state.npz
  if [ -s "$out" ]; then echo "=== $bb already done ==="; continue; fi
  for attempt in 1 2 3 4 5; do
    echo "=== $bb attempt $attempt $(date -u +%H:%M:%S) ==="
    timeout 5400 python scripts/compare_backbones.py --backbone $bb \
      --iters 600 --res 64 --chunk 60 --out $out \
      --state-file $st --resume && break
    echo "=== $bb attempt $attempt failed rc=$? ==="
    sleep 30
  done
done
if [ -s .compare/hash.jsonl ] && [ -s .compare/triplane.jsonl ]; then
  python scripts/compare_backbones.py --verdict-from .compare/hash.jsonl .compare/triplane.jsonl | tee .compare/verdict.json
fi
echo "=== compare done $(date -u +%H:%M:%S) ==="
