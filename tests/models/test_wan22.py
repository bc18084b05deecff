"""Wan2.2 model-family tests: DiT, T5 encoder, causal VAE."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mojo_opset_tpu.modeling.wan2_2 import (
    T5Encoder,
    T5Model,
    Wan2_2_VAE,
    WanConfig,
    WanModel,
    WanVAE_,
)
# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


def test_wan_dit_t2v_and_i2v():
    cfg = WanConfig(patch_size=(1, 2, 2), text_len=16, in_dim=4, dim=64, ffn_dim=128,
                    freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=2)
    model = WanModel(cfg, key=jax.random.PRNGKey(0))
    x = [jax.random.normal(jax.random.PRNGKey(1), (4, 2, 8, 8))]
    t = jnp.array([500.0])
    ctx = [jax.random.normal(jax.random.PRNGKey(2), (10, 48))]
    out = model(x, t, ctx, seq_len=32)
    assert out[0].shape == (4, 2, 8, 8)
    assert np.isfinite(np.asarray(out[0])).all()

    cfg2 = WanConfig(model_type="i2v", patch_size=(1, 2, 2), text_len=16, in_dim=4,
                     dim=64, ffn_dim=128, freq_dim=32, text_dim=48, out_dim=4,
                     num_heads=4, num_layers=1)
    m2 = WanModel(cfg2, key=jax.random.PRNGKey(3))
    y = [jax.random.normal(jax.random.PRNGKey(4), (4, 2, 8, 8))]
    out2 = m2(x, t, ctx, seq_len=32, y=y)
    assert out2[0].shape == (4, 2, 8, 8)


def test_wan_dit_batch_of_two_grids():
    cfg = WanConfig(patch_size=(1, 2, 2), text_len=8, in_dim=4, dim=32, ffn_dim=64,
                    freq_dim=16, text_dim=24, out_dim=4, num_heads=2, num_layers=1)
    model = WanModel(cfg, key=jax.random.PRNGKey(0))
    x = [
        jax.random.normal(jax.random.PRNGKey(1), (4, 2, 8, 8)),
        jax.random.normal(jax.random.PRNGKey(2), (4, 2, 8, 8)),
    ]
    t = jnp.array([10.0, 700.0])
    ctx = [jax.random.normal(jax.random.PRNGKey(3), (5, 24))] * 2
    out = model(x, t, ctx, seq_len=32)
    assert len(out) == 2 and out[1].shape == (4, 2, 8, 8)


def test_t5_encoder_and_model():
    enc = T5Encoder(vocab=64, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                    num_layers=2, num_buckets=8, shared_pos=True,
                    key=jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 12)), jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32).at[1, 8:].set(0)
    out = enc(ids, mask)
    assert out.shape == (2, 12, 32)
    # masked positions must not change unmasked outputs
    ids2 = ids.at[1, 8:].set(7)
    out2 = enc(ids2, mask)
    np.testing.assert_allclose(np.asarray(out[1, :8]), np.asarray(out2[1, :8]), atol=1e-5)

    t5 = T5Model(vocab_size=64, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                 encoder_layers=1, decoder_layers=1, num_buckets=8,
                 key=jax.random.PRNGKey(1))
    dec_ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (2, 6)), jnp.int32)
    logits = t5(ids, mask, dec_ids, None)
    assert logits.shape == (2, 6, 64)


def test_t5_decoder_is_causal():
    t5 = T5Model(vocab_size=64, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                 encoder_layers=1, decoder_layers=1, num_buckets=8,
                 key=jax.random.PRNGKey(1))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (1, 8)), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    dec = jnp.asarray(np.random.default_rng(1).integers(0, 64, (1, 6)), jnp.int32)
    full = t5(ids, mask, dec, None)
    # changing a later decoder token must not affect earlier logits
    dec2 = dec.at[0, 4].set((int(dec[0, 4]) + 1) % 64)
    full2 = t5(ids, mask, dec2, None)
    np.testing.assert_allclose(np.asarray(full[0, :4]), np.asarray(full2[0, :4]), atol=1e-5)
    assert not np.allclose(np.asarray(full[0, 4:]), np.asarray(full2[0, 4:]))


def test_vae_encode_decode_roundtrip_shapes():
    vae = WanVAE_(dim=16, dec_dim=16, z_dim=4, dim_mult=(2, 2), num_res_blocks=1,
                  temperal_downsample=(True,), key=jax.random.PRNGKey(0))
    # (B, 3, T, H, W) with T = 1 + 4k, H/W divisible by 2*patch*2^len(mult)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 16, 16))
    mu = vae.encode(x)
    # one temporal downsample: T' = 1 + (T-1)/2; spatial /2(patch) /2(one down)
    assert mu.shape == (1, 4, 3, 4, 4), mu.shape
    rec = vae.decode(mu)
    assert rec.shape == (1, 3, 5, 16, 16), rec.shape
    assert np.isfinite(np.asarray(rec)).all()


def test_vae_wrapper_scaling():
    vae = WanVAE_(dim=16, dec_dim=16, z_dim=4, dim_mult=(2, 2), num_res_blocks=1,
                  temperal_downsample=(True,), key=jax.random.PRNGKey(0))
    wrap = Wan2_2_VAE(vae=vae, z_dim=4, mean=np.full(4, 0.5), std=np.full(4, 2.0))
    video = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 16, 16))
    zs = wrap.encode([video])
    assert zs[0].shape == (4, 3, 4, 4)
    out = wrap.decode(zs)
    assert out[0].shape == (3, 5, 16, 16)
    assert float(jnp.abs(out[0]).max()) <= 1.0 + 1e-6


def test_wan_self_attention_masks_padded_keys():
    """Ragged batches: padded tokens must not act as attention keys
    (reference masks with k_lens=seq_lens). A batch of [real, padded]
    must reproduce the single-sample result for the real rows."""
    import numpy as np

    from mojo_opset_tpu.modeling.wan2_2.modeling_wan import WanSelfAttention

    dim, heads, s_real, s_pad = 64, 4, 12, 20
    attn = WanSelfAttention(dim, heads, key=jax.random.PRNGKey(3))
    x_real = jax.random.normal(jax.random.PRNGKey(1), (1, s_real, dim), jnp.float32)
    grid = jnp.asarray([[1, 3, 4]], jnp.int32)  # 1*3*4 = 12 tokens
    freqs = None

    # grid rope needs freqs; reuse the model's helper if present, else skip rope
    try:
        from mojo_opset_tpu.modeling.wan2_2.modeling_wan import rope_params

        freqs = rope_params(1024, dim // heads)
    except ImportError:
        pass

    want = np.asarray(attn(x_real, jnp.asarray([s_real], jnp.int32), grid, freqs))

    x_padded = jnp.concatenate(
        [x_real, jax.random.normal(jax.random.PRNGKey(2), (1, s_pad - s_real, dim))],
        axis=1,
    )
    got = np.asarray(
        attn(x_padded, jnp.asarray([s_real], jnp.int32), grid, freqs)
    )[:, :s_real]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
