#!/usr/bin/env bash
# deit_small_distilled_patch16_224 W2A2 QAT, hyperparameters matching the reference recipe.
# Requires LOCAL pretrained FP checkpoints (zero-egress: nothing downloads):
#   $2 = FP student warm-start (.pth.tar from timm/torchvision, or converted)
#   used for both --initial-checkpoint and --teacher_checkpoint.
# Scale across chips with a larger TPU mesh / --mesh-model-parallel, not
# --world_size process spawning.
DATA_DIR=${1:-/data/imagenet}
FP_CKPT=${2:?usage: $0 <data_dir> <fp_checkpoint.pth.tar>}

python3 -m ofq_tpu.cli.train -c configs/deit_imagenet_qat.yml "$DATA_DIR" \
  --model deit_small_distilled_patch16_224 --model_type deit \
  --epochs 300 --batch-size 140 --weight-decay 0.05 \
  --lr 5.47e-4 --warmup-lr 1.0e-6 --warmup-epochs 5 \
  --mixup 0.0 --cutmix 0.0 \
  --aq-enable --aq-mode lsq --aq-per-channel --aq_clip_learnable --aq-bitw 2 \
  --wq-enable --wq-per-channel --wq-bitw 2 --wq-mode statsq \
  --quantized --pretrained_initialized --initial-checkpoint "$FP_CKPT" \
  --use-kd --teacher deit_small_distilled_patch16_224 --teacher_type deit --kd_hard_and_soft 1 \
  --qk_reparam --qk_reparam_type 0 \
  --teacher_pretrained --teacher_checkpoint "$FP_CKPT" \
  --output ./outputs/w2a2_deit --experiment phase1

# CGA finetune from the phase-1 best checkpoint:
python3 -m ofq_tpu.cli.cga -c configs/deit_imagenet_qat.yml "$DATA_DIR" \
  --model deit_small_distilled_patch16_224 --model_type deit \
  --epochs 300 --batch-size 140 --weight-decay 0.05 \
  --lr 5.47e-4 --warmup-lr 1.0e-6 --warmup-epochs 5 \
  --mixup 0.0 --cutmix 0.0 \
  --aq-enable --aq-mode lsq --aq-per-channel --aq_clip_learnable --aq-bitw 2 \
  --wq-enable --wq-per-channel --wq-bitw 2 --wq-mode statsq \
  --quantized \
  --use-kd --teacher deit_small_distilled_patch16_224 --teacher_type deit --kd_hard_and_soft 1 \
  --qk_reparam --qk_reparam_type 1 --boundaryRange 0.005 --freeze_for_n_epochs 30 \
  --teacher_pretrained --teacher_checkpoint "$FP_CKPT" \
  --resume ./outputs/w2a2_deit/phase1 \
  --output ./outputs/w2a2_deit --experiment cga
