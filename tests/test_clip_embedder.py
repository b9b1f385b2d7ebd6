"""CLIPTextEmbedder contract tests — offline, with a tiny random-config
FlaxCLIPTextModel + a minimal BPE vocab (no pretrained weights in this
image). Mirrors reference/stable_diffusion/model/clip_embedder.py:20-50:
tokenize -> truncate -> pad to max_length=77 -> last_hidden_state (B,77,d).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_clip(tmp_path_factory):
    from transformers import CLIPTextConfig, CLIPTokenizer, FlaxCLIPTextModel

    d = tmp_path_factory.mktemp("clip_vocab")
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, t in enumerate(["a</w>", "crack</w>", "road</w>", "in</w>",
                           "the</w>", "c", "r", "k</w>", "photo</w>",
                           "of</w>", "x</w>", "y</w>", "z</w>", "q</w>"]):
        vocab[t] = i + 2
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    tok = CLIPTokenizer(str(d / "vocab.json"), str(d / "merges.txt"))
    cfg = CLIPTextConfig(vocab_size=len(vocab), hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=2, max_position_embeddings=77)
    model = FlaxCLIPTextModel(cfg, seed=0)
    return tok, model


def test_embedder_output_contract(tiny_clip):
    from diffusionmodel_tpu.models.latent_diffusion import CLIPTextEmbedder

    tok, model = tiny_clip
    emb = CLIPTextEmbedder(tokenizer=tok, model=model)
    out = np.asarray(emb(["a crack in the road", ""]))
    # (B, 77, d) last_hidden_state, finite, per the reference's contract
    assert out.shape == (2, 77, 32)
    assert np.isfinite(out).all()
    # the two prompts must produce different embeddings
    assert not np.allclose(out[0], out[1])


def test_tokenization_pads_and_truncates_to_77(tiny_clip):
    tok, _ = tiny_clip
    short = tok(["a crack"], truncation=True, max_length=77,
                padding="max_length", return_tensors="np")
    assert short["input_ids"].shape == (1, 77)
    # start token first, end token after the content, padding after
    ids = short["input_ids"][0]
    assert ids[0] == tok.bos_token_id
    n_real = int(short["attention_mask"][0].sum())
    assert ids[n_real - 1] == tok.eos_token_id
    # a prompt longer than 77 BPE tokens is TRUNCATED, not an error
    long = tok([" ".join(["crack"] * 200)], truncation=True, max_length=77,
               padding="max_length", return_tensors="np")
    assert long["input_ids"].shape == (1, 77)
    assert long["attention_mask"][0].sum() == 77


def test_txt2img_with_clip_embedder(tiny_clip):
    """Run the txt2img pipeline end-to-end from a PROMPT STRING through the
    tiny CLIP embedder (the reference path scripts/text_to_image.py:86-96)."""
    from diffusionmodel_tpu.models.latent_diffusion import (
        Autoencoder,
        CLIPTextEmbedder,
        LatentDiffusion,
        UNetModel,
    )
    from diffusionmodel_tpu.models.latent_diffusion.pipelines import Txt2Img

    tok, clip_model = tiny_clip
    emb = CLIPTextEmbedder(tokenizer=tok, model=clip_model)

    m = UNetModel(in_channels=4, out_channels=4, channels=32, n_res_blocks=1,
                  attention_levels=(1,), channel_multipliers=(1, 2),
                  n_heads=4, d_cond=32)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    cond0 = jnp.zeros((1, 77, 32))
    uvars = m.init(jax.random.PRNGKey(0), x, t, cond0)

    ae = Autoencoder(channels=16, ch_mults=(1, 2, 4, 4), z_channels=4,
                     emb_channels=4)
    img = jnp.zeros((1, 64, 64, 3))
    avars = ae.init(jax.random.PRNGKey(1), img, jax.random.PRNGKey(2))

    ldm = LatentDiffusion(
        eps_fn=lambda x, t, c: m.apply(uvars, x, t, c),
        encode_fn=lambda im: ae.apply(avars, im, method=ae.encode),
        decode_fn=lambda z: ae.apply(avars, z, method=ae.decode),
        n_steps=20)
    t2i = Txt2Img(ldm, embedder=emb, n_steps=3)
    out = t2i(jax.random.PRNGKey(3), prompt="a crack photo", batch_size=1,
              h=64, w=64, uncond_scale=7.5)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
