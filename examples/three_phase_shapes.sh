#!/usr/bin/env bash
# The complete reference recipe (SURVEY §3: train.py FP -> train.py QAT with
# KD warm-start -> cga.py finetune) end-to-end on the generated real-JPEG
# shapes dataset, under the TPU speed path (--compute-dtype bfloat16).
# Runs on one chip in ~15-25 min (compile-dominated at toy scale).
#
# Usage: bash examples/three_phase_shapes.sh [OUT_DIR] [DATA_DIR]
#   EXTRA="--matmul-impl int8" runs the same recipe with extra flags on
#   every phase (e.g. the integer-core headline config).
set -euo pipefail
OUT=${1:-/tmp/three_phase}
DATA=${2:-/tmp/shapes}
read -r -a EXTRA_ARGS <<< "${EXTRA:-}"
COMMON=(--img-size 64 --num-classes 3 --batch-size 32 --steps-per-epoch 14
        --mixup 0.0 --cutmix 0.0 --aa "" --reprob 0.0 --smoothing 0.0
        --model deit_test_distilled --compute-dtype bfloat16
        --cooldown-epochs 0 --output "$OUT"
        ${EXTRA_ARGS[@]+"${EXTRA_ARGS[@]}"})

[ -d "$DATA/train" ] || python examples/make_shapes_dataset.py "$DATA"

echo "=== phase 1: FP32-recipe float training (reference train.py, fp model)"
python -m ofq_tpu.cli.train "$DATA" "${COMMON[@]}" \
  --experiment fp --epochs 20 --lr 2e-3

echo "=== phase 2: W2A2 QKR QAT, warm-started from phase 1, FP-teacher KD"
python -m ofq_tpu.cli.train "$DATA" "${COMMON[@]}" \
  --experiment w2a2 --epochs 20 --lr 1e-3 \
  --quantized --wq-enable --wq-bitw 2 --wq-mode statsq \
  --aq-enable --aq-bitw 2 --aq-mode lsq --aq_clip_learnable \
  --qk_reparam --qk_reparam_type 0 \
  --pretrained_initialized --initial-checkpoint "$OUT/fp" \
  --use-kd --kd_hard_and_soft 1 --teacher deit_test_distilled \
  --teacher_checkpoint "$OUT/fp"

echo "=== phase 3: CGA finetune (reference cga.py: fixed window at min LR)"
python -m ofq_tpu.cli.cga "$DATA" "${COMMON[@]}" \
  --experiment w2a2_cga --epochs 20 --lr 1e-3 \
  --quantized --wq-enable --wq-bitw 2 --wq-mode statsq \
  --aq-enable --aq-bitw 2 --aq-mode lsq --aq_clip_learnable \
  --qk_reparam --qk_reparam_type 1 --boundaryRange 0.005 \
  --freeze_for_n_epochs 6 \
  --resume "$OUT/w2a2" \
  --use-kd --kd_hard_and_soft 1 --teacher deit_test_distilled \
  --teacher_checkpoint "$OUT/fp"

echo "=== deployment: freeze phase-3 into a packed-integer artifact"
python -m ofq_tpu.serve "$OUT/w2a2_cga" --export "$OUT/w2a2_frozen.npz"
echo "done: $OUT"
