"""EditSpeech: FastSpeech encoder + bidirectional LSTM decoders (flax.linen).

Capability parity: ``modules/speech_editing/editspeech/editspeech.py`` +
``lstm.py`` (ASRU'21 EditSpeech) — FastSpeech conditioner (skip_decoder) with
mel positional embedding added (:39-47); forward & backward 2-layer LSTM
decoders over frame-level states with prenet-conditioned inputs and
whole-batch teacher forcing p=0.5 (lstm.py:105-124); bidirectional fusion
splice inside the mask (tasks/speech_editing/editspeech.py:48-55).

TPU-first: both directions are ``nn.scan`` compiled while-loops; the
backward pass is flip -> scan -> flip. Teacher forcing is a traced scalar
select between the two (precomputable) input sequences, so one compiled
program covers both branches.

NOTE on fusion: the reference computes a *scalar* MSE between the two
directions, making the argmin degenerate (always the first masked frame, so
the whole mask comes from the backward decoder). We implement the
paper-correct per-frame L2 distance argmin; set ``degenerate=True`` on
:func:`bidirectional_fusion` to reproduce the reference behavior exactly.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_editing_tpu.models.fs import FastSpeech
from speech_editing_tpu.modules.lstm import LSTMDecoder
from speech_editing_tpu.modules.predictors import MelEncoder
from speech_editing_tpu.modules.transformer import sinusoidal_positional_embedding


class EditSpeech(nn.Module):
    vocab_size: int
    hp: Any
    out_dims: int = 80
    teacher_forcing_ratio: float = 0.5

    def setup(self):
        h = self.hp["hidden_size"]
        lstm_hidden = int(self.hp.get("lstm_hidden", 1024))
        self.fs = FastSpeech(self.vocab_size, self.hp)
        self.proj_in = nn.Dense(h)
        self.prenet = MelEncoder(hidden_size=h)
        self.forward_decoder = LSTMDecoder(lstm_hidden, self.out_dims)
        self.backward_decoder = LSTMDecoder(lstm_hidden, self.out_dims)

    def __call__(self, txt_tokens, time_mel_masks, mel2ph=None, spk_embed=None,
                 ref_mels=None, f0=None, uv=None, energy=None,
                 infer: bool = False, train: bool = False,
                 rng: Optional[jax.Array] = None, **kw):
        """txt_tokens [B,S]; time_mel_masks [B,T,1]; ref_mels [B,T,80]."""
        ret = self.fs(txt_tokens, None, mel2ph, spk_embed, f0, uv, energy,
                      skip_decoder=True, infer=infer, train=train)
        decoder_inp = ret["decoder_inp"]
        # mel positional embedding keyed off ref_mels channel 0 (reference
        # editspeech.py:40: embed_positions(ref_mels[..., 0]) — make_positions
        # counts nonzero entries, so padded frames get the zero row); this
        # matters for parity because the backward LSTM starts from the
        # padded tail and carries any difference into valid frames
        pos_tokens = (ref_mels[..., 0] != 0).astype(jnp.int32)
        decoder_inp = decoder_inp + sinusoidal_positional_embedding(
            pos_tokens, decoder_inp.shape[-1]).astype(decoder_inp.dtype)

        # free-running inputs: frame states + prenet of the unmasked mel
        prenet_out = self.prenet(ref_mels * (1 - time_mel_masks))
        input_tensor = decoder_inp + prenet_out
        if not infer:
            # teacher-forced inputs: projected ground-truth frames
            teacher_inputs = self.proj_in(ref_mels)
            if rng is None:
                rng = self.make_rng("teacher")
            tf = (jax.random.uniform(rng, ()) <
                  self.teacher_forcing_ratio).astype(input_tensor.dtype)
            inputs = tf * teacher_inputs + (1.0 - tf) * input_tensor
        else:
            inputs = input_tensor

        fwd = self.forward_decoder(inputs)
        if self.hp.get("ref_pad_compat"):
            # reference semantics: flip over the FULL padded axis, so the
            # backward LSTM carries state from the padded tail into real
            # frames (lstm.py:105-124 under padded training batches)
            bwd = jnp.flip(self.backward_decoder(jnp.flip(inputs, axis=1)),
                           axis=1)
        else:
            # scan the backward decoder from the TRUE end of each row, not
            # the bucket end: right-align every row (roll by T - len), flip,
            # scan, flip back, re-align. At exact fit (len == T) the rolls
            # are identity, so per-item numerics are unchanged; at padded
            # frame buckets the backward decoder sees exactly the exact-fit
            # frame sequence, making bucket padding inert for the batched
            # server (the padded tail is consumed AFTER all real frames and
            # only pollutes padded output rows, which callers mask).
            t_axis = inputs.shape[1]
            lengths = jnp.sum(pos_tokens, axis=1)  # true frame counts [B]
            shift = (t_axis - lengths)[:, None]  # right-roll amount
            pos = jnp.arange(t_axis)[None, :]
            gather = lambda x, idx: jnp.take_along_axis(
                x, idx[:, :, None], axis=1)
            right_aligned = gather(inputs, (pos - shift) % t_axis)
            bwd = jnp.flip(self.backward_decoder(
                jnp.flip(right_aligned, axis=1)), axis=1)
            bwd = gather(bwd, (pos + shift) % t_axis)
        ret["forward_outputs"] = fwd
        ret["backward_outputs"] = bwd
        return ret


def bidirectional_fusion(forward_outputs: jax.Array,
                         backward_outputs: jax.Array,
                         ref_mels: jax.Array, time_mel_masks: jax.Array,
                         degenerate: bool = False) -> jax.Array:
    """Splice fwd/bwd predictions at the point of minimum disagreement
    inside the mask, composite with ground truth outside."""
    tm = time_mel_masks[..., 0]
    if degenerate:
        dist = jnp.zeros_like(tm)
    else:
        dist = jnp.mean(
            (forward_outputs - backward_outputs) ** 2, axis=-1)
    dist = dist + (1 - tm) * 1e9
    t_fusion = jnp.argmin(dist, axis=-1)  # [B]
    t_idx = jnp.arange(tm.shape[1])[None, :]
    fwd_mask = (t_idx < t_fusion[:, None]).astype(
        forward_outputs.dtype)[:, :, None]
    fused = forward_outputs * fwd_mask + backward_outputs * (1 - fwd_mask)
    return fused * time_mel_masks + ref_mels * (1 - time_mel_masks)
