# Spec: reference configs/pixart_alpha_config/PixArt_xl2_img512_internalms.py
_base_ = ["../PixArt_xl2_internal.py"]
data = dict(type="PixArtMSDataset", dialect="alpha")
image_size = 512
model = "PixArtMS_XL_2"
aspect_ratio_type = 512
multi_scale = True
pe_interpolation = 1.0
train_batch_size = 40
num_epochs = 20
grad_checkpointing = True
gradient_clip = 0.01
optimizer = dict(type="adamw", lr=2e-5, weight_decay=3e-2, eps=1e-10)
lr_schedule_args = dict(num_warmup_steps=1000)
eval_sampling_steps = 200
log_interval = 20
save_model_steps = 2000
model_max_length = 120
