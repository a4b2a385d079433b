"""PortaSpeech: flows, FVAE, word-level encoder, tasks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_editing_tpu.modules.flows import Glow, ResFlow
from speech_editing_tpu.training.tasks.portaspeech import (PortaSpeechFlowTask,
                                                           PortaSpeechTask)
from tests.helpers import TINY_HP, VOCAB, synth_batch

PS_EXTRA = {
    "use_word_encoder": True, "word_enc_layers": 1, "dur_level": "word",
    "word_encoder_type": "fft", "text_encoder_postnet": True,
    "add_word_pos": True, "use_fvae": True, "fvae_enc_dec_hidden": 32,
    "latent_size": 8, "fvae_kernel_size": 5, "fvae_enc_n_layers": 2,
    "fvae_dec_n_layers": 2, "fvae_strides": 4, "use_prior_flow": True,
    "prior_flow_hidden": 16, "prior_flow_kernel_size": 3,
    "prior_flow_n_blocks": 2, "lambda_kl": 1.0, "kl_min": 0.0,
    "kl_start_steps": 100, "noise_scale": 0.8, "post_glow_hidden": 16,
    "post_glow_n_blocks": 2, "sigmoid_scale": False, "word_dict_size": 30,
    "frames_multiple": 4, "encoder_type": "fft",
}


def _word_batch(rng, B=2, S=8, T=64):
    b = synth_batch(rng, B=B, S=S, T=T)
    del b["time_mel_masks"]
    # words: every 2 phones -> 1 word
    ph2word = np.zeros((B, S), np.int64)
    word_tokens = np.zeros((B, S // 2), np.int64)
    mel2word = np.zeros((B, T), np.int64)
    for i in range(B):
        s_eff = (b["txt_tokens"][i] != 0).sum()
        ph2word[i, :s_eff] = np.arange(s_eff) // 2 + 1
        n_words = int(ph2word[i].max())
        word_tokens[i, :n_words] = rng.randint(3, 30, n_words)
        m2p = b["mel2ph"][i]
        mel2word[i] = np.where(m2p > 0, (m2p - 1) // 2 + 1, 0)
    b.update(ph2word=ph2word, word_tokens=word_tokens, mel2word=mel2word,
             pitch=rng.randint(0, 256, (B, T)).astype(np.int64))
    return b


def test_resflow_invertible(rng):
    flow = ResFlow(c_in=8, hidden_size=16, kernel_size=3, n_flow_steps=2,
                   n_flow_layers=2, c_cond=12)
    x = jnp.asarray(rng.randn(2, 16, 8), jnp.float32)
    nonpad = jnp.ones((2, 16, 1))
    cond = jnp.asarray(rng.randn(2, 16, 12), jnp.float32)
    params = flow.init(jax.random.PRNGKey(0), x, nonpad, cond)
    z = flow.apply(params, x, nonpad, cond)
    x_rec = flow.apply(params, z, nonpad, cond, reverse=True)
    assert np.allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_glow_invertible_with_logdet(rng):
    flow = Glow(channels=8, hidden_size=16, kernel_size=3, n_blocks=2,
                n_layers=2, c_cond=12)
    x = jnp.asarray(rng.randn(2, 16, 8), jnp.float32)
    nonpad = jnp.ones((2, 16, 1))
    cond = jnp.asarray(rng.randn(2, 16, 12), jnp.float32)
    params = flow.init(jax.random.PRNGKey(0), x, nonpad, cond)
    z, logdet = flow.apply(params, x, nonpad, cond)
    assert logdet.shape == (2,) and np.isfinite(np.asarray(logdet)).all()
    x_rec, _ = flow.apply(params, z, nonpad, cond, reverse=True)
    assert np.allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)


def test_multi_window_disc(rng):
    from speech_editing_tpu.modules.multi_window_disc import \
        MultiWindowDiscriminator

    disc = MultiWindowDiscriminator(time_lengths=(8, 16), hidden_size=16)
    x = jnp.asarray(rng.randn(2, 40, 80), jnp.float32)
    x_len = jnp.asarray([40, 32])
    params = disc.init(jax.random.PRNGKey(0), x, x_len,
                       rng=jax.random.PRNGKey(1))
    out = disc.apply(params, x, x_len, rng=jax.random.PRNGKey(2))
    assert out["y"].shape == (2, 1)
    assert len(out["start_frames"]) == 2
    # reuse the same windows (disc step on generator-step clips)
    out2 = disc.apply(params, x, x_len, start_frames=out["start_frames"])
    assert np.allclose(np.asarray(out["y"]), np.asarray(out2["y"]), atol=1e-5)


@pytest.mark.parametrize("task_cls", [PortaSpeechTask, PortaSpeechFlowTask])
def test_portaspeech_task(task_cls, rng):
    hp = dict(TINY_HP)
    hp.update(vocab_size=VOCAB, binary_data_dir="", use_spk_embed=True,
              use_pitch_embed=False, **PS_EXTRA)
    task = task_cls(hp)
    model = task.build_model()
    batch_np = _word_batch(rng)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    variables = task.init_model(model, batch_np, jax.random.PRNGKey(0))
    loss_fn = task.make_loss_fn(model)
    (total, metrics), grads = jax.jit(jax.value_and_grad(
        loss_fn, has_aux=True))(variables["params"], batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total)), metrics
    assert "kl" in metrics and np.isfinite(float(metrics["kl"]))
    if task_cls is PortaSpeechFlowTask:
        assert "postflow" in metrics
    g2 = float(sum(jnp.sum(x ** 2) for x in jax.tree.leaves(grads)))
    assert g2 > 0

    infer_fn = task.build_infer_fn(model)
    out = infer_fn(variables, batch, jax.random.PRNGKey(2))
    mel_out = np.asarray(out["mel_out"])
    assert mel_out.shape[0] == 2 and mel_out.shape[2] == 80
    assert np.isfinite(mel_out).all()
