_base_ = ["../PixArt_xl2_internal.py"]
image_size = 1024
model = "PixArtMS_XL_2"
aspect_ratio_type = 1024
multi_scale = True
pe_interpolation = 2.0
micro_condition = True
train_batch_size = 12
num_epochs = 10
grad_checkpointing = True
gradient_clip = 0.01
optimizer = dict(type="came", lr=2e-5, weight_decay=0.0,
                 betas=(0.9, 0.999, 0.9999), eps=(1e-30, 1e-16))
model_max_length = 120
