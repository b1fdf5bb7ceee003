#!/bin/bash
# Round-5 queue E — final-session remainder after the SECOND mid-round
# host swap (which again wiped output/ + .jax_cache and broke the
# oid_joint symlinks; re-materialized by tools/oid_hands_labels.py +
# tools/make_oid_joint.py before this queue starts).
#
# What queue D already banked (committed evidence): s42 chain +
# overlays, s7 north star 0.237, int8 sweep + drift. What it did NOT
# reach before the swap: the RGB-only ablation (the one explicit
# remaining piece of VERDICT r4 task 1's done-criteria), the third
# seed, and the finetune stretch. Priority order here reflects that:
#   1. oid_joint_baseline (RGB-only, 20 ep — s42/s7 both peaked @19)
#   2. oid_joint_s1234 (third seed, 20 ep)
#   3. bench (headline artifact sanity on this host)
#   4. stretch: s7 re-run (living checkpoint) -> photo finetune
# Fresh sentinel prefix r5e_ so stale bare-name sentinels from earlier
# queues cannot skip these steps.
set -x
set -o pipefail
cd "$(dirname "$0")/.."
export DFVOD_JAX_CACHE="$PWD/.jax_cache"
# The ladder is opt-in (data/loader.py:101) and the tunnel charges
# ~2.5 min per distinct program — without this the first queue-E
# baseline launch paid 5 bucket compiles in 15 min before being killed
# and relaunched.
export DFVOD_BUCKET_LADDER=512,896
mkdir -p logs_r5 output .sentinels

for i in $(seq 1 30); do
  if timeout 120 python -c "import jax,jax.numpy as jnp; print(jax.devices()); print(float(jnp.sum(jnp.ones((8,)))))"; then
    break
  fi
  echo "tunnel check $i failed; retrying in 60s"; sleep 60
  [ "$i" = 30 ] && exit 1
done

step() { # step <name> <deadline_s> <cmd...>
  local name=$1 deadline=$2; shift 2
  if [ -f ".sentinels/r5e_$name" ]; then echo "skip $name (sentinel)"; return 0; fi
  if python scripts/supervise.py --stall 900 --deadline "$deadline" -- \
      "$@" 2>&1 | tee "logs_r5/$name.log"; then
    touch ".sentinels/r5e_$name"
    bash scripts/harvest_artifacts.sh logs_r5/artifacts || true
  else
    echo "STEP FAILED: $name" | tee -a "logs_r5/$name.log"
    return 1
  fi
}

# ---- 1. RGB-only ablation (the depth delta; VERDICT r4 task 1) ----
step oid_joint_baseline 7200 \
  env EPOCHS=20 FUSION=Baseline USE_DEPTH=off EXP_DIR=output/oid_joint_baseline/ \
  bash configs/training/OID_Joint.sh --auto_resume
step oid_joint_baseline_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_baseline/best \
    --fusion_type Baseline

# ---- 2. third seed for the spread table ----
step oid_joint_s1234 7200 \
  env EPOCHS=20 EXP_DIR=output/oid_joint_s1234/ \
  bash configs/training/OID_Joint.sh --seed 1234 --auto_resume
step oid_joint_s1234_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_s1234/best

# ---- 3. headline bench sanity on this host ----
step bench_final 3000 \
  python bench.py

echo QUEUE_R5E_CORE_DONE

# ---- 4. stretch: rebuild the living checkpoint, then photo finetune ----
step oid_joint_s7b 7200 \
  env EPOCHS=25 EXP_DIR=output/oid_joint_s7/ \
  bash configs/training/OID_Joint.sh --seed 7 --auto_resume
step oid_joint_s7b_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_s7/best
step oid_finetune2 5400 \
  env EPOCHS=200 EXP_DIR=output/oid_finetune2/ \
  bash configs/training/OID_LateFusion.sh --resume output/oid_joint_s7/best \
    --lr 5e-5 --strong_aug --eval_every 10 --auto_resume \
    --train_short_sides 448
step oid_finetune2_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_finetune2/best

echo QUEUE_R5E_DONE
