# Spec: reference configs/pixart_sigma_config/PixArt_sigma_xl2_img1024_internalms.py
_base_ = ["./PixArt_sigma_xl2_img512_internalms.py"]
image_size = 1024
aspect_ratio_type = 1024
pe_interpolation = 2.0
train_batch_size = 4
num_epochs = 2
log_interval = 10
save_model_steps = 1000
