# Spec: reference configs/pixart_alpha_config/PixArt_xl2_img256_internal.py
_base_ = ["../PixArt_xl2_internal.py"]
image_size = 256
model = "PixArt_XL_2"
train_batch_size = 176
num_epochs = 200
optimizer = dict(type="adamw", lr=2e-5, weight_decay=3e-2, eps=1e-10)
lr_schedule_args = dict(num_warmup_steps=1000)
model_max_length = 120
