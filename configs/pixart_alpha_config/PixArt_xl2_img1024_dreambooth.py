# Spec: reference configs/pixart_alpha_config/PixArt_xl2_img1024_dreambooth.py
# Consumed by scripts/train_dreambooth_lora.py (config positional arg).
_base_ = ["../PixArt_xl2_internal.py"]
data_root = "data/dreambooth/dataset"
data = dict(type="DreamBooth", root="dog6", prompt=["a photo of sks dog"],
            dialect="alpha")
image_size = 1024
model = "PixArtMS_XL_2"
aspect_ratio_type = 1024
multi_scale = True
pe_interpolation = 2.0
load_from = "Path/to/PixArt-XL-2-1024-MS.pth"
train_batch_size = 1
num_epochs = 200
grad_checkpointing = True
gradient_clip = 0.01
optimizer = dict(type="adamw", lr=5e-6, weight_decay=3e-2, eps=1e-10)
lr_schedule_args = dict(num_warmup_steps=0)
auto_lr = None
log_interval = 1
save_model_epochs = 10000
save_model_steps = 100
model_max_length = 120
