# Toy end-to-end config: small DiT on the synthetic shapes dataset from
# tools/make_toy_dataset.py, latents from a scripts/train_vae.py VAE.
# Purpose: prove the full train -> sample -> decode loop with real learned
# weights (the reference's README.md:120-146 toy-dataset workflow, fully
# offline). Not a parity config; the architecture is shrunk via
# model_overrides.
_base_ = ["../PixArt_xl2_internal.py"]

data_root = "/tmp/toy"
data = dict(
    type="PixArtDataset",
    root="InternData",
    dialect="sigma",
    load_vae_feat=True,   # precomputed by tools/extract_features.py
    load_t5_feat=True,    # pseudo-T5 hash embeddings (make_toy_dataset.py)
)
image_size = 128
model = "PixArt_XL_2"
model_overrides = dict(
    depth=6,
    hidden_size=256,
    num_heads=4,
    caption_channels=64,   # --caption-dim of make_toy_dataset.py
)
fp32_attention = False
pe_interpolation = 0.25  # 16px latent grid vs the 64px base grid
model_max_length = 12
class_dropout_prob = 0.1

vae_pretrained = "/tmp/toy_vae"  # dir from scripts/train_vae.py
# 1/std of the toy-VAE latent means (measured); the SDXL analog is 0.13025
scale_factor = 0.3264

train_batch_size = 256
num_epochs = 1000
optimizer = dict(type="adamw", lr=2e-4, weight_decay=0.0, eps=1e-10)
lr_schedule = "constant"
lr_schedule_args = dict(num_warmup_steps=500)
auto_lr = None  # keep the configured lr regardless of world batch
gradient_clip = 1.0
log_interval = 50
save_model_steps = 2000
save_model_epochs = 250  # toy epochs are 8 steps; default-1 would save every 8s
# ema_warmup (default on) debiases the EMA so the production 0.9999 works
# even for short runs (effective rate ramps (1+s)/(10+s) -> 0.9999); the
# round-2 workaround of lowering ema_rate to 0.99 is no longer needed.
ema_rate = 0.9999
eval_sampling_steps = 1000
deterministic_validation = True
real_prompt_ratio = 1.0
valid_num = 0
train_sampling_steps = 1000
snr_loss = False
