# Spec: reference configs/pixart_sigma_config/PixArt_sigma_xl2_img2K_internalms_kvcompress.py
_base_ = ["./PixArt_sigma_xl2_img1024_internalms_kvcompress.py"]
image_size = 2048
aspect_ratio_type = 2048
pe_interpolation = 4.0
train_batch_size = 4
