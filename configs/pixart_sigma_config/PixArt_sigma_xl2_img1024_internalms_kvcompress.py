# Spec: reference configs/pixart_sigma_config/PixArt_sigma_xl2_img1024_internalms_kvcompress.py
_base_ = ["./PixArt_sigma_xl2_img1024_internalms.py"]
kv_compress = True
kv_compress_config = {
    "sampling": "conv",
    "scale_factor": 2,
    "kv_compress_layer": [14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27],
}
qk_norm = False
