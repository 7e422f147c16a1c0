# Spec: reference configs/pixart_alpha_config/PixArt_xl2_img1024_internal.py
_base_ = ["../PixArt_xl2_internal.py"]
image_size = 1024
model = "PixArt_XL_2"
pe_interpolation = 2.0
train_batch_size = 2
num_epochs = 200
grad_checkpointing = True
gradient_clip = 0.01
optimizer = dict(type="adamw", lr=2e-5, weight_decay=3e-2, eps=1e-10)
lr_schedule_args = dict(num_warmup_steps=1000)
eval_sampling_steps = 200
log_interval = 20
save_model_steps = 2000
model_max_length = 120
