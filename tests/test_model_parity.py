"""END-TO-END model parity: our flax PixArt(MS) vs the reference torch model.

The functional shim (tests/torch_functional_shim.py) makes the reference
network runnable on CPU. Weights flow OUR init -> flax_to_torch_state_dict ->
reference load_state_dict, then both models see the same inputs; outputs must
agree to f32 tolerance. This is the strongest correctness evidence available
offline (released checkpoints are unreachable in this image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pixart_sigma_tpu.models.pixart import PixArt, PixArtConfig
from pixart_sigma_tpu.utils.checkpoint import flax_to_torch_state_dict
from tests.torch_functional_shim import upgrade_stubs

upgrade_stubs()
from diffusion.model.nets.PixArt import PixArt as RefPixArt  # noqa: E402
from diffusion.model.nets.PixArtMS import PixArtMS as RefPixArtMS  # noqa: E402

DIMS = dict(
    patch_size=2, in_channels=4, hidden_size=48, depth=2, num_heads=4,
    caption_channels=32, model_max_length=8,
)


def _ours(**kw):
    cfg = PixArtConfig(dtype=jnp.float32, scan_blocks=False, **DIMS, **kw)
    model = PixArt(cfg)
    rng = np.random.RandomState(0)
    B, L = 2, 8
    H = W = cfg.input_size
    x = rng.randn(B, H, W, 4).astype(np.float32)
    y = rng.randn(B, L, 32).astype(np.float32)
    mask = np.ones((B, L), np.int64)
    mask[1, 5:] = 0  # ragged caption for sample 2
    t = np.array([37.0, 801.0], np.float32)
    init_kwargs = {}
    if cfg.micro_condition:
        init_kwargs = dict(
            img_hw=jnp.asarray([[512.0, 512.0]] * B),
            aspect_ratio=jnp.asarray([[1.0]] * B),
        )
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(y),
        jnp.asarray(mask), **init_kwargs,
    )["params"]
    # randomise the zero-init heads so parity is non-trivial
    rnd = jax.random.normal
    params["final_layer"]["linear"]["kernel"] = (
        rnd(jax.random.PRNGKey(5), params["final_layer"]["linear"]["kernel"].shape) * 0.1
    )
    for i in range(cfg.depth):
        blk = params[f"blocks_{i}"]["cross_attn"]["proj"]
        blk["kernel"] = rnd(jax.random.PRNGKey(6 + i), blk["kernel"].shape) * 0.1
    return model, cfg, params, (x, t, y, mask), init_kwargs


def _run_reference(ref_cls, cfg, params, inputs, micro=False):
    x, t, y, mask = inputs
    sd = flax_to_torch_state_dict(params, cfg)
    ref = ref_cls(
        input_size=cfg.input_size, **DIMS,
        pe_interpolation=cfg.pe_interpolation,
        micro_condition=micro, qk_norm=cfg.qk_norm,
        kv_compress_config=(
            {
                "sampling": cfg.kv_compress_sampling,
                "scale_factor": cfg.kv_compress_scale,
                "kv_compress_layer": list(cfg.kv_compress_layers),
            }
            if cfg.kv_compress_sampling
            else None
        ),
    ).eval()
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all(m == "pos_embed" for m in missing), missing
    data_info = {
        "img_hw": torch.tensor([[512.0, 512.0]] * x.shape[0]),
        "aspect_ratio": torch.tensor([[1.0]] * x.shape[0]),
    }
    with torch.no_grad():
        out = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(np.asarray(t)),
            torch.from_numpy(y)[:, None],  # [B, 1, L, C]
            mask=torch.from_numpy(mask)[:, None, None],
            data_info=data_info,
        )
    return out.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC


@pytest.mark.parametrize(
    "variant,kw",
    [
        ("ms", dict(input_size=16, multi_scale=True)),
        ("ms_qknorm", dict(input_size=16, multi_scale=True, qk_norm=True)),
        ("ms_kv", dict(
            input_size=16, multi_scale=True, kv_compress_sampling="conv",
            kv_compress_scale=2, kv_compress_layers=(1,),
        )),
        ("alpha", dict(input_size=16, multi_scale=False)),
        ("ms_micro", dict(input_size=16, multi_scale=True, micro_condition=True)),
    ],
)
def test_full_model_parity(variant, kw):
    model, cfg, params, inputs, init_kwargs = _ours(**kw)
    x, t, y, mask = inputs
    ours = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(y),
        jnp.asarray(mask), **init_kwargs,
    )
    ref_cls = RefPixArt if variant == "alpha" else RefPixArtMS
    want = _run_reference(
        ref_cls, cfg, params, inputs, micro=cfg.micro_condition
    )
    np.testing.assert_allclose(
        np.asarray(ours), want, rtol=2e-4, atol=2e-4, err_msg=variant
    )


def test_full_inference_path_parity():
    """model + CFG + DPM-Solver-5 end to end: ours vs the reference stack."""
    from diffusion.model import dpm_solver as ref_dpm

    from pixart_sigma_tpu.diffusion.dpm_solver import (
        DPMSolver,
        NoiseScheduleVP,
        make_cfg_model_fn,
    )
    from pixart_sigma_tpu.diffusion.schedules import named_beta_schedule

    model, cfg, params, (x, t, y, mask), _ = _ours(input_size=16, multi_scale=True)
    B, L = 2, 8
    rng = np.random.RandomState(7)
    noise = rng.randn(B, 16, 16, 4).astype(np.float32)
    y_cond = y
    y_null = rng.randn(B, L, 32).astype(np.float32)
    full_mask = np.ones((2 * B, L), np.int64)
    betas = named_beta_schedule("linear", 1000)

    # ---- ours ----
    ns = NoiseScheduleVP("discrete", betas=betas)

    def apply_fn(xi, t_vec, cond, **kw):
        out = model.apply(
            {"params": params}, xi, t_vec, cond, jnp.asarray(full_mask)
        )
        return out[..., :4]

    model_fn = make_cfg_model_fn(
        apply_fn, ns, condition=jnp.asarray(y_cond),
        uncondition=jnp.asarray(y_null), cfg_scale=4.5,
    )
    ours = DPMSolver(model_fn, ns).sample(
        jnp.asarray(noise), steps=5, order=2, method="multistep"
    )

    # ---- reference (torch model via functional shim + reference solver) ----
    sd = flax_to_torch_state_dict(params, cfg)
    ref = RefPixArtMS(input_size=16, **DIMS, pe_interpolation=1.0).eval()
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    ref_ns = ref_dpm.NoiseScheduleVP(
        "discrete", betas=torch.tensor(betas, dtype=torch.float64)
    )
    ref_model_fn = ref_dpm.model_wrapper(
        lambda xx, tt, yy, **kw: ref.forward_with_dpmsolver(
            xx, tt, yy[:, None], None,
            mask=torch.from_numpy(full_mask)[:, None, None],
        ),
        ref_ns,
        model_type="noise",
        guidance_type="classifier-free",
        condition=torch.from_numpy(y_cond),
        unconditional_condition=torch.from_numpy(y_null),
        guidance_scale=4.5,
    )
    solver = ref_dpm.DPM_Solver(ref_model_fn, ref_ns, algorithm_type="dpmsolver++")
    with torch.no_grad():
        want = solver.sample(
            torch.from_numpy(noise.transpose(0, 3, 1, 2)),
            steps=5, order=2, skip_type="time_uniform", method="multistep",
        ).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-3, atol=2e-3)


def test_ddim_loop_parity():
    """Deterministic DDIM (eta=0) full loop: ours vs reference p_sample path."""
    from diffusion.model import gaussian_diffusion as ref_gd
    from diffusion.model.respace import SpacedDiffusion, space_timesteps

    from pixart_sigma_tpu.diffusion import IDDPM

    model, cfg, params, (x, t, y, mask), _ = _ours(input_size=16, multi_scale=True)
    B, L = 2, 8
    noise = np.random.RandomState(9).randn(B, 16, 16, 4).astype(np.float32)

    ours_diff = IDDPM(timestep_respacing=[8], learn_sigma=True)

    def model_fn(x_t, t_vec):
        return model.apply(
            {"params": params}, x_t, t_vec.astype(jnp.float32),
            jnp.asarray(y), jnp.asarray(mask),
        )

    got = ours_diff.ddim_sample_loop(
        model_fn, (B, 16, 16, 4), jax.random.PRNGKey(0),
        noise=jnp.asarray(noise), clip_denoised=False, eta=0.0,
    )

    sd = flax_to_torch_state_dict(params, cfg)
    ref = RefPixArtMS(input_size=16, **DIMS, pe_interpolation=1.0).eval()
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    betas = ref_gd.get_named_beta_schedule("linear", 1000)
    ref_diff = SpacedDiffusion(
        use_timesteps=space_timesteps(1000, [8]),
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType.EPSILON,
        model_var_type=ref_gd.ModelVarType.LEARNED_RANGE,
        loss_type=ref_gd.LossType.MSE,
    )
    class _Wrap(torch.nn.Module):
        def __init__(self, net):
            super().__init__()
            self.net = net

        def forward(self, xx, timestep=None, **kw):
            return self.net(
                xx, timestep, torch.from_numpy(y)[:, None],
                mask=torch.from_numpy(mask)[:, None, None],
            )

    with torch.no_grad():
        want = ref_diff.ddim_sample_loop(
            _Wrap(ref),
            (B, 4, 16, 16),
            noise=torch.from_numpy(noise.transpose(0, 3, 1, 2)),
            clip_denoised=False,
            eta=0.0,
            progress=False,
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
