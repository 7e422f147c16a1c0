# Base config: every knob with its default.
# Spec: /root/reference/configs/PixArt_xl2_internal.py:1-89 (same knob
# surface, TPU-native defaults: bf16 everywhere, no fp16 NaN machinery).
data_root = "data"
data = dict(
    type="PixArtDataset",
    root="InternData",
    image_list_json=["data_info.json"],
    transform="default_train",
    load_vae_feat=True,
    load_t5_feat=True,
    dialect="alpha",
)
image_size = 256
train_batch_size = 32
eval_batch_size = 16
valid_num = 0  # aspect ratio valid when sample count >= valid_num

# precision: bf16 compute on TPU removes the reference's fp16 NaN machinery;
# fp32_attention maps to fp32-softmax in XLA attention (the Pallas flash
# kernel always uses fp32 softmax)
mixed_precision = "bf16"  # ['bf16', 'fp32']
fp32_attention = True
attn_impl = "auto"  # ['auto', 'xla', 'flash']

# model
model = "PixArt_XL_2"
aspect_ratio_type = None  # e.g. 256/512/1024/2048 for multiscale buckets
multi_scale = False
pe_interpolation = 1.0
qk_norm = False
kv_compress = False
kv_compress_config = {
    "sampling": None,  # ['conv', 'uniform', 'ave', 'uniform_every']
    "scale_factor": 1,
    "kv_compress_layer": [],
}
scan_blocks = True  # compile depth as nn.scan groups (fast XLA compile)

# parallelism (TPU mesh; replaces the reference's DDP/FSDP accelerate knobs)
mesh = dict(data=-1, fsdp=1, tensor=1, seq=1)
# seq > 1: sequence/context parallelism — activations' token dim sharded
# over the mesh (chunked attention + GSPMD collectives); for 2K/4K grids
use_fsdp = False  # shard params/opt-state over the fsdp axis
use_tensor_parallel = False  # megatron TP on attn/MLP kernels (tensor axis)

# training
num_workers = 4
train_sampling_steps = 1000
visualize = False
deterministic_validation = False
eval_sampling_steps = 250
model_max_length = 120
lora_rank = 4
num_epochs = 80
gradient_accumulation_steps = 1
grad_checkpointing = False
remat_policy = "nothing"  # 'nothing'|'dots'|'dots_no_batch'|'everything'
gradient_clip = 1.0
auto_lr = dict(rule="sqrt")
validation_prompts = [
    "dog",
    "portrait photo of a girl, photograph, highly detailed face, depth of field",
    "Self-portrait oil painting, a beautiful cyborg with golden hair, 8k",
    "Astronaut in a jungle, cold color palette, muted colors, detailed, 8k",
    "A photo of beautiful mountain with realistic sunset and blue lake, highly detailed, masterpiece",
]

optimizer = dict(type="adamw", lr=1e-4, weight_decay=3e-2, eps=1e-10)
lr_schedule = "constant"
lr_schedule_args = dict(num_warmup_steps=500)

save_image_epochs = 1
save_model_epochs = 1
save_model_steps = 1000000

sample_posterior = True
scale_factor = 0.18215  # sd1.5 vae: 0.18215; sdxl vae: 0.13025
ema_rate = 0.9999
log_interval = 50
cfg_scale = 4.0
mask_type = "null"  # 'null' off | 'random'/'group': MAE-style masked training
mask_ratio = 0.0  # fraction of latent patches dropped when mask_type != null
mask_loss_coef = 0.0  # removed-patch loss weight (reference :65)
snr_gamma = None  # Min-SNR-gamma MSE rebalancing (arXiv 2303.09556; try 5.0)
load_from = None  # .pth / safetensors / orbax dir
resume_from = dict(
    checkpoint=None, load_ema=False, resume_optimizer=True, resume_lr_scheduler=True
)
snr_loss = False
real_prompt_ratio = 1.0
class_dropout_prob = 0.1
work_dir = "output/exps"
micro_condition = False
seed = 43
skip_step = 0

# encoders
vae_pretrained = None  # local dir with diffusers AutoencoderKL weights
t5_pretrained = None  # local dir with HF T5 encoder weights

# LCM distillation
loss_type = "huber"
huber_c = 0.001
num_ddim_timesteps = 50
w_max = 15.0
w_min = 3.0
ema_decay = 0.95
