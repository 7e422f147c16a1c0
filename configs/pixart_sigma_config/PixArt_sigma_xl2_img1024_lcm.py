# Spec: reference configs/pixart_sigma_config/PixArt_sigma_xl2_img1024_lcm.py
_base_ = ["./PixArt_sigma_xl2_img1024_internalms.py"]
data = dict(load_vae_feat=True, load_t5_feat=True)
train_batch_size = 12
num_epochs = 10
optimizer = dict(type="came", lr=1e-5, weight_decay=0.0,
                 betas=(0.9, 0.999, 0.9999), eps=(1e-30, 1e-16))
loss_type = "huber"
huber_c = 0.001
num_ddim_timesteps = 50
w_max = 15.0
w_min = 3.0
ema_decay = 0.95
cfg_scale = 4.5
