# Spec: reference configs/pixart_sigma_config/PixArt_sigma_xl2_img512_internalms.py
_base_ = ["../PixArt_xl2_internal.py"]
data = dict(type="PixArtMSDataset", root="InternData", dialect="sigma",
            load_vae_feat=False, load_t5_feat=False)
image_size = 512
model = "PixArtMS_XL_2"
aspect_ratio_type = 512
multi_scale = True
pe_interpolation = 1.0
train_batch_size = 32
num_epochs = 10
gradient_clip = 0.01
grad_checkpointing = True
optimizer = dict(type="came", lr=2e-5, weight_decay=0.0,
                 betas=(0.9, 0.999, 0.9999), eps=(1e-30, 1e-16))
lr_schedule_args = dict(num_warmup_steps=500)
scale_factor = 0.13025
real_prompt_ratio = 0.5
model_max_length = 300
