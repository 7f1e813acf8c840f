#!/usr/bin/env bash
# R2R fine-tune with MAKD distillation — the reference training regime
# (reference: map_nav_src/scripts/run_r2r_kdl_valid.sh flags, reconstructed
# training variant).  Point --root_dir at a Matterport dataset tree; without
# one, the synthetic backend runs the identical pipeline.
set -e
flag="--root_dir ${ROOT_DIR:-../datasets}
      --dataset r2r
      --output_dir ${OUTPUT_DIR:-runs}
      --name r2r_magic_s
      --mode train
      --train_alg dagger
      --batch_size 16
      --lr 4e-5
      --iters 100000
      --log_every 1000
      --ml_weight 0.2
      --max_action_len 15
      --max_instr_len 200
      --expert_policy spl
      --feat_dropout 0.4
      --train_kdl
      --teacher_hidden_size 768
      --teacher_num_attention_heads 12
      --student_hidden_size 128
      --student_num_attention_heads 2
      --kdl_alpha 0.5
      --kdl_logit_loss kd
      --kdl_adaptive_ability_weight
      --kdl_adaptive_ability_weight_type RW
      --teacher_sample_hard_mining
      --t_sample_preprocess exp
      --t_sample_preprocess_exp_decay 0.7
      $*"
python -m vln_magic_tpu.cli.main_nav $flag
