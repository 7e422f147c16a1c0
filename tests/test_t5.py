"""T5 encoder parity vs transformers' torch T5EncoderModel (tiny config)."""

import json
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pixart_sigma_tpu.models.t5 import (
    T5Config,
    T5Encoder,
    hf_t5_to_flax,
    relative_position_bucket,
)


def _torch_tiny():
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=128,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_heads=4,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return T5EncoderModel(hf_cfg).eval()


def test_relative_position_bucket_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention as HFT5Attention

    pos = np.arange(40)
    rel = pos[None, :] - pos[:, None]
    ours = relative_position_bucket(rel, 32, 128)
    theirs = HFT5Attention._relative_position_bucket(
        torch.from_numpy(rel), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_t5_encoder_matches_transformers():
    model = _torch_tiny()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = T5Config.small_test()
    params = hf_t5_to_flax(sd, cfg)

    rng = np.random.RandomState(0)
    B, L = 2, 16
    ids = rng.randint(0, 128, (B, L))
    mask = np.ones((B, L), np.int64)
    mask[0, 10:] = 0

    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    enc = T5Encoder(cfg)
    got = enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    # only compare valid positions (HF also computes padded ones but they are
    # never attended to; values there may differ)
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(got)[valid], want[valid], rtol=2e-4, atol=2e-5
    )


def test_pseudo_t5_matches_toy_dataset_features():
    """PseudoT5Embedder must be bit-identical to make_toy_dataset's
    --pseudo-t5 features (the model was trained on those)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_toy_dataset", "/root/repo/tools/make_toy_dataset.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pixart_sigma_tpu.models.t5 import PseudoT5Embedder

    prompt = "a red circle on a black background"
    dim, L = 64, 12
    fea, mask = mod.pseudo_t5_features(prompt, dim, L)
    emb = PseudoT5Embedder(dim, L)
    y, m = emb.get_text_embeddings([prompt, ""])
    n = fea.shape[0]
    np.testing.assert_array_equal(np.asarray(y)[0, :n], fea.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(y)[0, n:], 0.0)
    np.testing.assert_array_equal(np.asarray(m)[0, :n], 1)
    np.testing.assert_array_equal(np.asarray(m)[0, n:], 0)
    np.testing.assert_array_equal(np.asarray(m)[1], 0)


def test_t5_embedder_from_pretrained_dry_run(tmp_path):
    """Full dry-run of the T5Embedder.from_pretrained path with a TOY
    checkpoint dir: a programmatically built T5-convention fast tokenizer
    (tokenizer.json — no network, no sentencepiece) + a tiny saved
    T5EncoderModel. Covers every stage the real T5-XXL load will hit except
    the download (round-3 VERDICT next #5)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, processors
    from pixart_sigma_tpu.models.t5 import T5Embedder

    # --- toy T5-convention tokenizer: <pad>=0, </s>=1, <unk>=2 ---
    words = (
        "a photo of the cat dog small cactus with happy face mountain "
        "sunset lake astronaut jungle oil painting"
    ).split()
    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2}
    for w in words:
        vocab.setdefault(w, len(vocab))
    for i in range(len(vocab), 128):
        vocab[f"tok{i}"] = i
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", special_tokens=[("</s>", 1)]
    )
    tok.save(str(tmp_path / "tokenizer.json"))
    (tmp_path / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "pad_token": "<pad>", "eos_token": "</s>", "unk_token": "<unk>",
        "model_max_length": 512,
    }))

    # --- tiny T5 encoder checkpoint in HF layout (safetensors) ---
    model = _torch_tiny()
    model.save_pretrained(tmp_path, safe_serialization=True)

    emb = T5Embedder.from_pretrained(
        str(tmp_path), model_max_length=16,
        dtype=jnp.float32, param_dtype=None, config=T5Config.small_test(),
    )
    texts = ["A photo of a cat", "a small cactus with a happy face"]
    y, mask = emb.get_text_embeddings(texts)
    assert y.shape == (2, 16, 32) and mask.shape == (2, 16)
    assert np.isfinite(np.asarray(y)).all()
    # caption cleaning lowercases -> all words in-vocab -> no <unk>
    enc = emb.tokenizer(
        [t.lower() for t in texts], max_length=16, padding="max_length",
        truncation=True, return_tensors="np",
    )
    assert not (enc["input_ids"] == vocab["<unk>"]).any()

    # golden: HF forward on the same ids equals our embeddings
    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(enc["input_ids"]),
            attention_mask=torch.from_numpy(enc["attention_mask"]),
        ).last_hidden_state.numpy()
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(y)[valid], want[valid], rtol=2e-4, atol=2e-5
    )
