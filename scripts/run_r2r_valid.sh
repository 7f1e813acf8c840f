#!/usr/bin/env bash
# R2R validation/submission (reference run_r2r_kdl_valid.sh counterpart).
set -e
flag="--root_dir ${ROOT_DIR:-../datasets}
      --dataset r2r
      --output_dir ${OUTPUT_DIR:-runs}
      --name r2r_magic_s_valid
      --mode valid
      --batch_size 16
      --max_action_len 15
      --student_hidden_size 128
      --student_num_attention_heads 2
      --submit
      $*"
python -m vln_magic_tpu.cli.main_nav $flag
