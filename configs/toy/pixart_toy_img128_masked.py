# Masked-token training variant of the toy config: MAE-style token dropping
# (mask_ratio) with the removed-patch loss term, exercising the reference's
# gaussian_diffusion.py:836-849 hook + model/utils.py masking end-to-end on
# real data. Used by docs/toy_workflow.md §"masked training".
_base_ = ["pixart_toy_img128.py"]

mask_type = "random"
mask_ratio = 0.25
mask_loss_coef = 1.0  # removed-patch ("mae") branch weight
