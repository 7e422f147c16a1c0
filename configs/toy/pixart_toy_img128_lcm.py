# LCM consistency distillation on the toy teacher (docs/toy_workflow.md §7):
# the offline convergence proof for the LCM trainer, mirroring the sigma LCM
# config's knobs (PixArt_sigma_xl2_img1024_lcm.py) at toy scale.
_base_ = ["pixart_toy_img128.py"]

work_dir = "/tmp/lcm_run"
train_batch_size = 64
optimizer = dict(type="adamw", lr=1e-5, weight_decay=0.0)
lr_schedule = "constant"
lr_schedule_args = dict(num_warmup_steps=100)
loss_type = "huber"
huber_c = 0.001
num_ddim_timesteps = 50
ema_decay = 0.95
cfg_scale = 4.5
log_interval = 25
save_model_steps = 1000
