#!/usr/bin/env bash
# Proxy-task pretraining (reference pretrain_src/run_r2r_magic.sh regime:
# batch 48, lr 5e-5, 200k steps, tasks mlm/sap/cfp 1:1:1).
set -e
python -m vln_magic_tpu.cli.train_pretrain \
    --output_dir ${OUTPUT_DIR:-runs/pretrain_r2r} \
    --train_batch_size 48 --learning_rate 5e-5 \
    --num_train_steps 200000 --valid_steps 2000 "$@"
