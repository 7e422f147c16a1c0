# Spec: reference configs/pixart_app_config/PixArt-DMD_xl2_img512_internalms.py
# Consumed by scripts/train_pixart_dmd.py via --config (flags still win).
_base_ = ["../PixArt_xl2_internal.py"]
data_root = "pixart-sigma-toy-dataset"
data = dict(type="DMD", root="InternData", dialect="sigma",
            load_vae_feat=True, load_t5_feat=True)
image_size = 512
model = "PixArtMS_XL_2"
aspect_ratio_type = 512
multi_scale = True
pe_interpolation = 1.0
load_from = "PixArt-alpha/PixArt-XL-2-512x512"
train_batch_size = 1
num_epochs = 10
grad_checkpointing = True
gradient_clip = 0.01
optimizer = dict(type="came", lr=2e-5, weight_decay=0.0,
                 betas=(0.9, 0.999, 0.9999), eps=(1e-30, 1e-16))
lr_schedule_args = dict(num_warmup_steps=1000)
log_interval = 20
save_model_steps = 2000
model_max_length = 300
