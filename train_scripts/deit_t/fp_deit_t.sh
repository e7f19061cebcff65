#!/usr/bin/env bash
# Phase-0: deit_tiny_distilled_patch16_224 FULL-PRECISION from scratch —
# the FP baseline (reference configs/deit_default_imagent.attn_q.yml,
# README table's 72.02 top-1 row) that the W{2,3,4} QAT phases warm-start
# from.  No quantization, no KD; 300 epochs + 10 cooldown, cosine LR.
DATA_DIR=${1:-/data/imagenet}

python3 -m ofq_tpu.cli.train -c configs/deit_imagenet_fp.yml "$DATA_DIR" \
  --model deit_tiny_distilled_patch16_224 --model_type deit \
  --output ./outputs/fp_deit_t --experiment phase0
