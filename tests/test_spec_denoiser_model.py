import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import TINY_HP, VOCAB, synth_batch


@pytest.fixture(scope="module")
def model_and_params():
    from speech_editing_tpu.models.spec_denoiser.spec_denoiser import GaussianDiffusion

    model = GaussianDiffusion(vocab_size=VOCAB, hp=TINY_HP)
    rng = np.random.RandomState(0)
    b = synth_batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        jnp.asarray(b["txt_tokens"]), jnp.asarray(b["time_mel_masks"])[..., None],
        jnp.asarray(b["mel2ph"]), jnp.asarray(b["spk_embed"]),
        jnp.asarray(b["mels"]), jnp.asarray(b["f0"]), jnp.asarray(b["uv"]),
        rng=jax.random.PRNGKey(2))
    return model, params, b


def test_train_forward_shapes(model_and_params):
    model, params, b = model_and_params
    ret = model.apply(
        params, jnp.asarray(b["txt_tokens"]), jnp.asarray(b["time_mel_masks"])[..., None],
        jnp.asarray(b["mel2ph"]), jnp.asarray(b["spk_embed"]),
        jnp.asarray(b["mels"]), jnp.asarray(b["f0"]), jnp.asarray(b["uv"]),
        rng=jax.random.PRNGKey(3))
    assert ret["mel_out"].shape == b["mels"].shape
    assert ret["dur"].shape == b["txt_tokens"].shape
    assert ret["pitch_pred"].shape == b["f0"].shape + (2,)
    assert np.isfinite(np.asarray(ret["mel_out"])).all()


def test_train_forward_jits_and_masks_padding(model_and_params):
    model, params, b = model_and_params

    @jax.jit
    def fwd(params, rng):
        return model.apply(
            params, jnp.asarray(b["txt_tokens"]), jnp.asarray(b["time_mel_masks"])[..., None],
            jnp.asarray(b["mel2ph"]), jnp.asarray(b["spk_embed"]),
            jnp.asarray(b["mels"]), jnp.asarray(b["f0"]), jnp.asarray(b["uv"]),
            rng=rng)["mel_out"]

    out = np.asarray(fwd(params, jax.random.PRNGKey(4)))
    # padding frames (mel2ph == 0) must be zero
    pad = b["mel2ph"] == 0
    assert np.abs(out[pad]).max() == 0


def test_infer_loop(model_and_params):
    model, params, b = model_and_params

    @jax.jit
    def infer(params, rng):
        return model.apply(
            params, jnp.asarray(b["txt_tokens"]), jnp.asarray(b["time_mel_masks"])[..., None],
            jnp.asarray(b["mel2ph"]), jnp.asarray(b["spk_embed"]),
            jnp.asarray(b["mels"]), jnp.asarray(b["f0"]), jnp.asarray(b["uv"]),
            infer=True, use_pred_pitch=True, rng=rng)["mel_out"]

    out = np.asarray(infer(params, jax.random.PRNGKey(5)))
    assert out.shape == b["mels"].shape
    assert np.isfinite(out).all()


def test_grads_flow(model_and_params):
    model, params, b = model_and_params

    def loss_fn(p):
        ret = model.apply(
            p, jnp.asarray(b["txt_tokens"]), jnp.asarray(b["time_mel_masks"])[..., None],
            jnp.asarray(b["mel2ph"]), jnp.asarray(b["spk_embed"]),
            jnp.asarray(b["mels"]), jnp.asarray(b["f0"]), jnp.asarray(b["uv"]),
            rng=jax.random.PRNGKey(6), train=True,
            rngs={"dropout": jax.random.PRNGKey(7)})
        mask = jnp.asarray(b["time_mel_masks"])[..., None]
        return jnp.abs((ret["mel_out"] - jnp.asarray(b["mels"])) * mask).sum() / mask.sum()

    g = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0
