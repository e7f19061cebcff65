#!/usr/bin/env bash
# Evaluate a W2A2 checkpoint (ours, or a released torch .pth.tar
# which is converted on the fly).  Keep the published global batch size —
# the reference warns eval must match it (README.md:31).
DATA_DIR=${1:-/data/imagenet}
CKPT=${2:?usage: $0 <data_dir> <checkpoint>}

python3 -m ofq_tpu.cli.eval -c configs/swin_imagenet_qat.yml "$DATA_DIR" \
  --model swin_t --model_type swin --batch-size 64 \
  --aq-enable --aq-mode lsq --aq-per-channel --aq_clip_learnable --aq-bitw 2 \
  --wq-enable --wq-per-channel --wq-bitw 2 --wq-mode statsq \
  --quantized --qk_reparam --qk_reparam_type 1 \
  --resume "$CKPT"
