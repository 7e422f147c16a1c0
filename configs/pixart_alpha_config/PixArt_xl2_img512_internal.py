_base_ = ["../PixArt_xl2_internal.py"]
image_size = 512
model = "PixArt_XL_2"
train_batch_size = 40
num_epochs = 20
optimizer = dict(type="adamw", lr=2e-5, weight_decay=3e-2, eps=1e-10)
model_max_length = 120
