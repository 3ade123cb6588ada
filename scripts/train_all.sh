#!/usr/bin/env bash
# Train all three benchmark datasets in sequence, data-parallel over the
# available chips (BASELINE config: multi-dataset training on one slice).
# Usage: scripts/train_all.sh [extra main.py flags, e.g. --compute_dtype bfloat16]
set -euo pipefail
cd "$(dirname "$0")/.."

for cfg in charadessta activitynet tacos; do
  echo "=== ${cfg} ==="
  python main.py --config_path "config/${cfg}.yml" "$@"
done
