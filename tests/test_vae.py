"""VAE tests: component parity vs torch primitives, shapes, tiled decode."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from pixart_sigma_tpu.models.vae import (
    AutoencoderKL,
    ResnetBlock,
    VAEConfig,
    diffusers_vae_to_flax,
    tiled_decode,
)


def test_resnet_block_matches_torch():
    """Our ResnetBlock == GroupNorm/SiLU/Conv composition in torch."""
    rng = np.random.RandomState(0)
    C = 8
    x = rng.randn(1, 6, 6, C).astype(np.float32)
    blk = ResnetBlock(out_channels=C, groups=4)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    def t_conv(tree, xt):
        w = torch.from_numpy(np.asarray(tree["kernel"]).transpose(3, 2, 0, 1).copy())
        b = torch.from_numpy(np.asarray(tree["bias"]))
        return F.conv2d(xt, w, b, padding=1)

    def t_gn(tree, xt):
        return F.group_norm(
            xt, 4,
            torch.from_numpy(np.asarray(tree["scale"])),
            torch.from_numpy(np.asarray(tree["bias"])), eps=1e-6,
        )

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    h = t_conv(params["conv1"], F.silu(t_gn(params["norm1"], xt)))
    h = t_conv(params["conv2"], F.silu(t_gn(params["norm2"], h)))
    want = (xt + h).numpy().transpose(0, 2, 3, 1)

    got = blk.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_vae_shapes_and_roundtrip():
    cfg = VAEConfig.small_test()
    vae = AutoencoderKL(cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3), jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    mean, logvar = vae.apply(params, x, method=AutoencoderKL.encode)
    # 2 blocks -> one downsample -> /2... wait: len(ch)-1 = 1 downsample => /2
    assert mean.shape == (2, 16, 16, 4)
    assert logvar.shape == mean.shape
    img = vae.apply(params, mean, method=AutoencoderKL.decode)
    assert img.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(img).all())


def test_tiled_decode_blending_is_exact_for_local_decode():
    """With a purely local decode fn, tiling must reconstruct exactly
    (weights sum to 1 everywhere) — this validates the blend machinery."""
    z = jnp.asarray(np.random.RandomState(2).randn(1, 24, 24, 4), jnp.float32)

    def local_decode(zz):  # nearest x2 upsample + channel mix: rf == 1
        B, h, w, C = zz.shape
        up = jax.image.resize(zz, (B, h * 2, w * 2, C), method="nearest")
        return up[..., :3] * 1.7 - up[..., 1:4] * 0.3

    full = local_decode(z)
    tiled = tiled_decode(local_decode, z, tile=16, overlap=8)
    assert tiled.shape == full.shape
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), atol=1e-5)


def test_tiled_decode_runs_on_real_decoder():
    cfg = VAEConfig.small_test()
    vae = AutoencoderKL(cfg)
    z = jnp.asarray(np.random.RandomState(2).randn(1, 24, 24, 4), jnp.float32)
    params = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)), jax.random.PRNGKey(1)
    )
    decode = lambda zz: vae.apply(params, zz, method=AutoencoderKL.decode)
    tiled = tiled_decode(decode, z, tile=16, overlap=8)
    assert tiled.shape == (1, 48, 48, 3)
    assert bool(jnp.isfinite(tiled).all())


def test_diffusers_key_mapping_covers_sdxl_layout():
    """Converter consumes a synthetic diffusers-style state dict; forward runs."""
    cfg = VAEConfig.small_test()
    rng = np.random.RandomState(3)

    sd = {}

    def add_conv(name, cin, cout, k=3):
        sd[f"{name}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def add_gn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def add_lin(name, cin, cout):
        sd[f"{name}.weight"] = rng.randn(cout, cin).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def add_res(prefix, cin, cout):
        add_gn(f"{prefix}.norm1", cin)
        add_conv(f"{prefix}.conv1", cin, cout)
        add_gn(f"{prefix}.norm2", cout)
        add_conv(f"{prefix}.conv2", cout, cout)
        if cin != cout:
            add_conv(f"{prefix}.conv_shortcut", cin, cout, k=1)

    def add_attn(prefix, c):
        add_gn(f"{prefix}.group_norm", c)
        for n in ("to_q", "to_k", "to_v"):
            add_lin(f"{prefix}.{n}", c, c)
        add_lin(f"{prefix}.to_out.0", c, c)

    ch = cfg.block_out_channels  # (8, 16)
    add_conv("encoder.conv_in", 3, ch[0])
    cin = ch[0]
    for i, c in enumerate(ch):
        for j in range(cfg.layers_per_block):
            add_res(f"encoder.down_blocks.{i}.resnets.{j}", cin, c)
            cin = c
        if i < len(ch) - 1:
            add_conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
    add_res("encoder.mid_block.resnets.0", ch[-1], ch[-1])
    add_attn("encoder.mid_block.attentions.0", ch[-1])
    add_res("encoder.mid_block.resnets.1", ch[-1], ch[-1])
    add_gn("encoder.conv_norm_out", ch[-1])
    add_conv("encoder.conv_out", ch[-1], 8)

    add_conv("decoder.conv_in", 4, ch[-1])
    add_res("decoder.mid_block.resnets.0", ch[-1], ch[-1])
    add_attn("decoder.mid_block.attentions.0", ch[-1])
    add_res("decoder.mid_block.resnets.1", ch[-1], ch[-1])
    cin = ch[-1]
    for i, c in enumerate(reversed(ch)):
        for j in range(cfg.layers_per_block + 1):
            add_res(f"decoder.up_blocks.{i}.resnets.{j}", cin, c)
            cin = c
        if i < len(ch) - 1:
            add_conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
    add_gn("decoder.conv_norm_out", ch[0])
    add_conv("decoder.conv_out", ch[0], 3)
    add_conv("quant_conv", 8, 8, k=1)
    add_conv("post_quant_conv", 4, 4, k=1)

    params = {"params": diffusers_vae_to_flax(sd, cfg)}
    vae = AutoencoderKL(cfg)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    out, mean, logvar = vae.apply(params, x, jax.random.PRNGKey(0))
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_make_tiled_decode_matches_host_tiled():
    """On-device (single-program scan) tiled decoder == host-loop tiled
    decoder == direct decode on shapes that tile evenly and unevenly."""
    import jax
    import jax.numpy as jnp

    from pixart_sigma_tpu.models.vae import (
        AutoencoderKL, VAEConfig, make_tiled_decode, tiled_decode,
    )

    cfg = VAEConfig.small_test()
    vae = AutoencoderKL(cfg)
    params = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(1)
    )
    decode = lambda z: vae.apply(params, z, method=AutoencoderKL.decode)
    rng = np.random.RandomState(0)
    for h, w in ((24, 24), (24, 40), (16, 16)):
        z = jnp.asarray(rng.randn(2, h, w, 4).astype(np.float32))
        direct = decode(z)
        host = tiled_decode(decode, z, tile=16, overlap=8)
        dev = make_tiled_decode(decode, tile=16, overlap=8)(z)
        np.testing.assert_allclose(
            np.asarray(dev), np.asarray(host), rtol=1e-5, atol=1e-5,
            err_msg=f"hw={h}x{w}",
        )
        # blending error vs the direct decode stays bounded (tiling cuts
        # the receptive field; ~0.06 mean on this random tiny VAE)
        assert float(jnp.abs(dev - direct).mean()) < 0.1
