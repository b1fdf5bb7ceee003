#!/bin/bash
# Snapshot run metadata (args.yaml, best_meta.json, log.txt — NOT weights)
# from output/ (untracked, dies with host swaps) into a tracked
# artifacts dir (arg 1, default logs_r5/artifacts), so every
# completed/partial run leaves a recorded trace even if the host is
# swapped mid-round (VERDICT r3 task 5c).
set -e
cd "$(dirname "$0")/.."
dest=${1:-logs_r5/artifacts}
mkdir -p "$dest"
for d in output/*/; do
  name=$(basename "$d")
  mkdir -p "$dest/$name"
  for f in args.yaml best_meta.json log.txt train_output.txt; do
    [ -f "$d$f" ] && cp "$d$f" "$dest/$name/$f"
  done
done
echo "harvested $(ls $dest | wc -l) runs into $dest"
