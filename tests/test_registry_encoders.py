"""FastSpeech encoder/decoder registry variants (rel_fft, tacotron, rnn)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_editing_tpu.models.fs import FastSpeech
from tests.helpers import TINY_HP, VOCAB, synth_batch


@pytest.mark.parametrize("enc,dec", [
    ("rel_fft", "conv"),
    ("tacotron", "conv"),
    ("tacotron2", "rnn"),
])
def test_encoder_decoder_variants(enc, dec, rng):
    hp = dict(TINY_HP)
    hp.update(encoder_type=enc, decoder_type=dec, use_spk_embed=False)
    model = FastSpeech(VOCAB, hp)
    b = synth_batch(rng, B=2, S=8, T=48)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(b["txt_tokens"]), None, jnp.asarray(b["mel2ph"]),
        None, jnp.asarray(b["f0"]), jnp.asarray(b["uv"]))

    @jax.jit
    def fwd(v):
        return model.apply(v, jnp.asarray(b["txt_tokens"]), None,
                           jnp.asarray(b["mel2ph"]), None,
                           jnp.asarray(b["f0"]), jnp.asarray(b["uv"]))

    out = fwd(variables)
    assert out["mel_out"].shape == (2, 48, 80)
    assert np.isfinite(np.asarray(out["mel_out"])).all()
