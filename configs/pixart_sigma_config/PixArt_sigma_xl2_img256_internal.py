# Spec: reference configs/pixart_sigma_config/PixArt_sigma_xl2_img256_internal.py
_base_ = ["../PixArt_xl2_internal.py"]
data = dict(type="PixArtDataset", root="InternData", dialect="sigma",
            load_vae_feat=False, load_t5_feat=False)
image_size = 256
model = "PixArt_XL_2"
load_from = None
vae_pretrained = None  # sdxl vae dir
pe_interpolation = 0.5
train_batch_size = 64
num_epochs = 200
gradient_clip = 0.01
optimizer = dict(type="came", lr=2e-5, weight_decay=0.0,
                 betas=(0.9, 0.999, 0.9999), eps=(1e-30, 1e-16))
lr_schedule_args = dict(num_warmup_steps=1000)
scale_factor = 0.13025
real_prompt_ratio = 0.5
model_max_length = 300
