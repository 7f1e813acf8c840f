#!/usr/bin/env bash
# RxR fine-tune (reference run_rxr_kdl_valid.sh regime: 28 actions, 250
# instruction tokens, nDTW expert).
set -e
flag="--root_dir ${ROOT_DIR:-../datasets}
      --dataset rxr
      --output_dir ${OUTPUT_DIR:-runs}
      --name rxr_magic_s
      --mode train
      --train_alg dagger
      --batch_size 16
      --lr 4e-5
      --iters 100000
      --max_action_len 28
      --max_instr_len 250
      --expert_policy ndtw
      --train_kdl
      --teacher_hidden_size 768
      --student_hidden_size 128
      --student_num_attention_heads 2
      $*"
python -m vln_magic_tpu.cli.main_nav $flag
