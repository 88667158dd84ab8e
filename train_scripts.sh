#!/usr/bin/env bash
# Canonical training recipes — 1:1 with the reference's train_scripts.sh.
# The CLI surface (config names, group swaps, ++ force-adds) is identical;
# only hardware selection differs: `hardware=default` = all local TPU chips
# via mesh data-parallelism (the reference's `two_gpus_dp` DataParallel role).

### DiChaViT on CHAMMI dataset:
python main.py -m -cn chammi_cfg model=dichavit ++model.enable_sample=True ++model.pretrained_model_name=small tag=chammi_demo dataset=morphem70k_v2_12channels ++optimizer.params.lr=0.00004 ++model.temperature=0.07 ++train.num_epochs=60 ++train.save_model=last ++model.new_channel_inits=[zero] ++train.batch_size=64 ++eval.batch_size=256 ++train.debug=False ++eval.every_n_epochs=6 ++eval.skip_eval_first_epoch=True ++train.tps_prob=0.2 ++model.orthogonal_channel_emb_init=True ++train.extra_loss_lambda=1 ++model.proxy_loss_lambda=0.1 ++model.ortho_loss_v1_lambda=1 ++model.gamma_s=0.5 ++model.gamma_d=2 ++model.reverse_pos_pairs=True ++train.seed=2025 ++model.hcs_sampling=lowest_cosine_prob

### DiChaViT on JUMP-CP dataset:
python main.py -m -cn jump_cp_cfg data_chunk=jump_cp_8 tag=jumpcp_demo model=dichavit ++model.patch_size=16 ++model.enable_sample=True ++model.new_channel_inits=[zero] ++model.pretrained_model_name=small ++optimizer.params.lr=0.0004 ++model.temperature=0.07 ++train.num_epochs=100 ++train.save_model=last ++train.batch_size=64 ++eval.batch_size=256 ++eval.every_n_epochs=1 ++eval.eval_subset_channels=True ++eval.skip_eval_first_epoch=True ++optimizer.params.weight_decay=0.04 ++scheduler.params.warmup_t=10 hardware=default ++model.use_channelvit_channels=True ++train.extra_loss_lambda=1 ++model.proxy_loss_lambda=0.001 ++model.ortho_loss_v1_lambda=0.001 ++model.gamma_s=1 ++model.gamma_d=4 ++model.reverse_pos_pairs=True ++model.orthogonal_channel_emb_init=True ++train.seed=33978 ++model.hcs_sampling=lowest_cosine_prob ++model.hcs_sampling_temp=1000

### DiChaViT on So2Sat
python main.py -m -cn so2sat_city_cfg data_chunk=so2sat_city_full tag=so2sat_demo model=dichavit ++model.patch_size=8 ++model.enable_sample=True ++model.new_channel_inits=[zero] ++model.pretrained_model_name=small ++optimizer.params.lr=0.0004 ++model.temperature=0.07 ++train.num_epochs=100 ++train.save_model=last ++train.batch_size=128 ++eval.batch_size=256 ++eval.every_n_epochs=1 ++eval.eval_subset_channels=False ++eval.skip_eval_first_epoch=True ++model.use_channelvit_channels=True ++train.extra_loss_lambda=1 ++model.proxy_loss_lambda=0.001 ++model.ortho_loss_v1_lambda=0.1 ++model.gamma_s=0.5 ++model.gamma_d=4 ++model.reverse_pos_pairs=True ++model.orthogonal_channel_emb_init=True ++model.hcs_sampling=lowest_cosine_prob ++train.seed=2025 ++model.hcs_sampling_temp=0.01

### ChannelViT on CHAMMI dataset:
python main.py -m -cn chammi_cfg model=channelvit_adapt ++model.enable_sample=True ++model.pretrained_model_name=small tag=12channels dataset=morphem70k_v2_12channels ++optimizer.params.lr=0.00004 ++model.temperature=0.07 ++train.num_epochs=60 ++train.save_model=last ++model.new_channel_inits=[zero] ++train.batch_size=64 ++eval.batch_size=256 ++train.debug=False ++eval.every_n_epochs=6 ++eval.skip_eval_first_epoch=True ++train.seed=215579 ++train.tps_prob=0.2

### ChannelViT on JUMP-CP dataset:
python main.py -m -cn jump_cp_cfg data_chunk=jump_cp_8 tag=jumpcp_8 model=channelvit_adapt ++model.patch_size=16 ++model.enable_sample=True ++model.new_channel_inits=[zero] ++model.pretrained_model_name=small ++optimizer.params.lr=0.0004 ++model.temperature=0.07 ++train.num_epochs=100 ++train.save_model=last ++train.batch_size=64 ++eval.batch_size=256 ++eval.every_n_epochs=1 ++eval.eval_subset_channels=True ++optimizer.params.weight_decay=0.04 ++train.seed=831964 ++scheduler.params.warmup_t=10 hardware=default

### ChannelViT on So2Sat dataset:
python main.py -m -cn so2sat_city_cfg data_chunk=so2sat_city_full tag=subchannels model=channelvit_adapt ++model.patch_size=8 ++model.enable_sample=True ++model.new_channel_inits=[zero] ++model.pretrained_model_name=small ++optimizer.params.lr=0.0004 ++model.temperature=0.07 ++train.num_epochs=100 ++train.save_model=last ++train.batch_size=256 ++eval.batch_size=512 ++eval.every_n_epochs=1 ++eval.eval_subset_channels=True ++eval.skip_eval_first_epoch=True ++model.use_channelvit_channels=True ++train.seed=837387 ++scheduler.params.warmup_t=10

### Synthetic smoke run (TPU-build addition; CPU-friendly, ~1 min):
# JAX_PLATFORMS=cpu python main.py -cn synthetic_cfg ++train.debug=True train.num_epochs=1

### TPU-native geometry (this build's addition): the reference's 6-head
### ViT-S runs every attention matmul at 50% of the TPU's 128-wide MXU;
### the `small_tpu` preset (`++model.pretrained_model_name=small_tpu`, or
### equivalently `++model.num_heads=3` on the `small` preset) re-heads it
### to head_dim 128 at IDENTICAL parameter count and FLOPs: +40% training
### throughput measured (flagship 250 -> 347 imgs/s/chip; bench.py reports
### both as mxu_native_dh128_value / mxu_native_recipe_value).
### HONEST TRADE: the head partition changes the function — checkpoints
### trained at 3x128 are NOT weight-compatible evaluations of the 6x64
### architecture (same tree shapes, different attention grouping), so pick
### the geometry at the START of a run; quality must be (re)validated per
### geometry, and the reference-parity headline stays at 6 heads.
# e.g.: python main.py -m -cn jump_cp_cfg ... model=dichavit ++model.pretrained_model_name=small_tpu

### int8 quantised training (opt-in, `++model.quantization=int8`): runs the
### fused-MLP GEMMs on the MXU's 2x int8 path (in-VMEM AQT — per-row dynamic
### activation scales, int32 accumulation; weight grads stay bf16).
### +3.7% at dh=64, +5.8% at dh=128 (fastest combo: small_tpu + int8 =
### 365.7 imgs/s/chip flagship). NOT reference numerics — loss-curve
### equivalence evidence in PERFORMANCE.md; default stays "none".
# e.g.: python main.py -m -cn jump_cp_cfg ... ++model.pretrained_model_name=small_tpu ++model.quantization=int8
