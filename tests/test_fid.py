"""InceptionV3 FID extractor + Fréchet statistic tests.

Parity targets: pytorch-fid's InceptionV3 semantics (avg pool with
count_include_pad=False, eval-mode BN, bilinear align_corners=False resize)
checked against torch.nn.functional on CPU, plus the Fréchet distance
against its closed form for Gaussians.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from pixart_sigma_tpu.models.inception import (  # noqa: E402
    FEATURE_DIM,
    BasicConv2d,
    InceptionV3,
    _avg_pool_3x3_exclude_pad,
    extract_activations,
    random_inception_params,
    torch_inception_to_flax,
)

sys.path.insert(0, "/root/repo/tools")
from compute_fid import frechet_distance  # noqa: E402


def test_avg_pool_exclude_pad_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).standard_normal((2, 7, 9, 5)).astype(np.float32)
    ours = _avg_pool_3x3_exclude_pad(jnp.asarray(x))
    theirs = F.avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, stride=1, padding=1,
        count_include_pad=False,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_basic_conv_bn_eval_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    mod = BasicConv2d(6, (3, 3), stride=2)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # non-trivial running stats
    variables = jax.tree_util.tree_map(jnp.asarray, {
        "params": {
            "conv": {"kernel": rng.standard_normal((3, 3, 3, 6)).astype(np.float32)},
            "bn": {"scale": rng.standard_normal(6).astype(np.float32),
                   "bias": rng.standard_normal(6).astype(np.float32)},
        },
        "batch_stats": {
            "bn": {"mean": rng.standard_normal(6).astype(np.float32),
                   "var": rng.uniform(0.5, 2.0, 6).astype(np.float32)},
        },
    })
    ours = mod.apply(variables, jnp.asarray(x))
    w = torch.from_numpy(
        np.asarray(variables["params"]["conv"]["kernel"]).transpose(3, 2, 0, 1).copy())
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = F.conv2d(xt, w, stride=2)
    bn = variables["batch_stats"]["bn"]
    pp = variables["params"]["bn"]
    yt = F.batch_norm(
        yt, torch.from_numpy(np.asarray(bn["mean"])),
        torch.from_numpy(np.asarray(bn["var"])),
        torch.from_numpy(np.asarray(pp["scale"])),
        torch.from_numpy(np.asarray(pp["bias"])),
        training=False, eps=1e-3,
    )
    yt = F.relu(yt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), yt, rtol=1e-4, atol=1e-4)


def test_resize_matches_torch_align_corners_false():
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(2).uniform(0, 1, (1, 17, 23, 3)).astype(np.float32)
    ours = jax.image.resize(jnp.asarray(x), (1, 299, 299, 3), method="bilinear")
    theirs = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(299, 299),
        mode="bilinear", align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def inception():
    return random_inception_params(seed=0)


def test_inception_output_shape_and_determinism(inception):
    model, variables = inception
    x = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    out = model.apply(variables, x)
    assert out.shape == (2, FEATURE_DIM)
    assert np.isfinite(np.asarray(out)).all()
    _, variables2 = random_inception_params(seed=0)
    out2 = model.apply(variables2, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_inception_block_widths(inception):
    """In-channel widths at every merge point pin the architecture wiring."""
    _, variables = inception
    p = variables["params"]

    def in_ch(block, branch="branch1x1"):
        return p[block][branch]["conv"]["kernel"].shape[2]

    assert in_ch("Mixed_5b") == 192
    assert in_ch("Mixed_5c") == 256   # 64+64+96+32
    assert in_ch("Mixed_5d") == 288   # 64+64+96+64
    assert in_ch("Mixed_6a", "branch3x3") == 288
    assert in_ch("Mixed_6b") == 768   # 384+96+288
    assert in_ch("Mixed_7a", "branch3x3_1") == 768
    assert in_ch("Mixed_7b") == 1280  # 320+192+768
    assert in_ch("Mixed_7c") == 2048  # 320+768+768+192


def test_torch_state_dict_round_trip(inception):
    """flax params -> torch-layout state dict -> converter == original."""
    model, variables = inception

    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    for path, leaf in flat:
        keys = [k.key for k in path]
        mods, mod, leafname = keys[:-2], keys[-2], keys[-1]
        prefix = ".".join(mods)
        v = np.asarray(leaf)
        if mod == "conv":
            sd[f"{prefix}.conv.weight"] = v.transpose(3, 2, 0, 1)
        elif leafname == "scale":
            sd[f"{prefix}.bn.weight"] = v
        else:
            sd[f"{prefix}.bn.bias"] = v
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables["batch_stats"])[0]:
        keys = [k.key for k in path]
        prefix = ".".join(keys[:-2])
        name = "running_mean" if keys[-1] == "mean" else "running_var"
        sd[f"{prefix}.bn.{name}"] = np.asarray(leaf)
    # heads the converter must skip
    sd["fc.weight"] = np.zeros((1008, 2048), np.float32)
    sd["fc.bias"] = np.zeros(1008, np.float32)
    sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.zeros((), np.int64)

    converted = torch_inception_to_flax(sd)
    x = jnp.asarray(
        np.random.default_rng(4).uniform(0, 1, (1, 75, 75, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(model.apply(variables, x)),
        np.asarray(model.apply(converted, x)),
        rtol=1e-5, atol=1e-5,
    )


def test_converter_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unrecognised"):
        torch_inception_to_flax({"Mixed_5b.branch1x1.conv.bias": np.zeros(3)})


def test_extract_activations_batching(inception):
    model, variables = inception
    imgs = np.random.default_rng(5).uniform(0, 1, (5, 32, 32, 3)).astype(np.float32)
    acts = extract_activations(model, variables, imgs, batch=2)
    assert acts.shape == (5, FEATURE_DIM)
    one = extract_activations(model, variables, imgs[4:5], batch=2)
    np.testing.assert_allclose(acts[4], one[0], rtol=2e-4, atol=2e-4)


def test_random_extractor_discriminates(inception):
    """The He-scaled random embedding must separate structure from noise.

    Regression: flax default (lecun) init collapsed across-image variance to
    ~4e-5 after 47 ReLU convs, making every FID 0.0. With He rescaling the
    same-distribution FID must be far below the structured-vs-noise FID.
    """
    model, variables = inception
    rng = np.random.default_rng(7)
    size = 64

    def shapes_batch(n, seed):
        r = np.random.default_rng(seed)
        out = np.zeros((n, size, size, 3), np.float32)
        for i in range(n):
            c0, c1 = r.integers(8, size - 8, 2)
            rad = int(r.integers(6, 16))
            y, x = np.ogrid[:size, :size]
            mask = (y - c0) ** 2 + (x - c1) ** 2 < rad ** 2
            out[i][mask] = r.uniform(0.5, 1.0, 3).astype(np.float32)
        return out

    a = extract_activations(model, variables, shapes_batch(8, 10), batch=8)
    b = extract_activations(model, variables, shapes_batch(8, 11), batch=8)
    noise = extract_activations(
        model, variables,
        rng.uniform(0, 1, (8, size, size, 3)).astype(np.float32), batch=8)
    same = frechet_distance(a.astype(np.float64), b.astype(np.float64))
    diff = frechet_distance(a.astype(np.float64), noise.astype(np.float64))
    assert diff > 5 * same, (same, diff)
    assert a.std(axis=0).mean() > 1e-3  # inter-image signal survives depth


def test_frechet_distance_closed_form():
    rng = np.random.default_rng(6)
    a = rng.standard_normal((4000, 8))
    assert frechet_distance(a, a) == pytest.approx(0.0, abs=1e-6)
    # mean shift by d in every dim: FID ≈ |d|^2 * D for identical covariances
    shift = a + 0.5
    fid = frechet_distance(a, shift)
    assert fid == pytest.approx(0.25 * 8, rel=0.05)
    # inflated covariance: Tr(S1 + 4 S1 - 2*2 S1) = Tr(S1) ≈ D
    fid2 = frechet_distance(a, 2.0 * rng.standard_normal((4000, 8)))
    assert fid2 == pytest.approx(8.0, rel=0.15)
