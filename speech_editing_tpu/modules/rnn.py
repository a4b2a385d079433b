"""Tacotron-style RNN modules (flax.linen, scanned GRUs).

Parity surface: ``modules/commons/rnn.py`` — PreNet (:8), HighwayNetwork
(:25), CBHG conv-bank + highway + BiGRU (:72), TacotronEncoder (:154),
RNNEncoder (tacotron2, :173), DecoderRNN (:212). These back the
``encoder_type: tacotron|tacotron2`` / ``decoder_type: rnn`` registry
options of FastSpeech.

TPU-first: recurrences are ``nn.scan`` GRU cells (one XLA while-loop per
direction), conv banks are SAME 1-D convs, batch norms become LayerNorm
(stateless under jit).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class PreNet(nn.Module):
    fc1_dim: int = 256
    fc2_dim: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Dense(self.fc1_dim, name="fc1")(x))
        # reference applies dropout in eval too (Tacotron convention)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.fc2_dim, name="fc2")(x))
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class HighwayNetwork(nn.Module):
    size: int

    @nn.compact
    def __call__(self, x):
        g = jax.nn.sigmoid(nn.Dense(self.size, name="W2",
                                    bias_init=nn.initializers.zeros)(x))
        y = nn.relu(nn.Dense(self.size, name="W1")(x))
        return g * y + (1.0 - g) * x


class _GRU(nn.Module):
    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, xs):
        b = xs.shape[0]
        if self.reverse:
            xs = jnp.flip(xs, axis=1)
        carry = jnp.zeros((b, self.hidden), xs.dtype)
        scan = nn.scan(nn.GRUCell, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        _, hs = scan(self.hidden, name="cell")(carry, xs)
        return jnp.flip(hs, axis=1) if self.reverse else hs


class BiGRU(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, xs):
        fwd = _GRU(self.hidden, name="fwd")(xs)
        bwd = _GRU(self.hidden, reverse=True, name="bwd")(xs)
        return jnp.concatenate([fwd, bwd], -1)


class CBHG(nn.Module):
    """Conv bank (K widths) -> maxpool -> projections -> highway -> BiGRU."""

    bank_k: int
    channels: int
    proj_channels: Tuple[int, int]
    num_highways: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        banks = []
        for k in range(1, self.bank_k + 1):
            c = nn.Conv(self.channels, (k,), padding="SAME",
                        name=f"bank_{k}")(x)
            banks.append(nn.relu(nn.LayerNorm(name=f"bank_norm_{k}")(c)))
        y = jnp.concatenate(banks, -1)
        y = nn.max_pool(y, (2,), strides=(1,), padding="SAME")
        y = nn.Conv(self.proj_channels[0], (3,), padding="SAME",
                    name="proj1")(y)
        y = nn.relu(nn.LayerNorm(name="proj1_norm")(y))
        y = nn.Conv(self.proj_channels[1], (3,), padding="SAME",
                    name="proj2")(y)
        y = nn.LayerNorm(name="proj2_norm")(y)
        if y.shape[-1] != residual.shape[-1]:
            y = nn.Dense(residual.shape[-1], name="pre_highway")(y)
        y = y + residual
        for i in range(self.num_highways):
            y = HighwayNetwork(y.shape[-1], name=f"highway_{i}")(y)
        return BiGRU(self.channels, name="rnn")(y)


class TacotronEncoder(nn.Module):
    """Embed -> PreNet -> CBHG -> project (rnn.py:154-171)."""

    vocab_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, txt_tokens, train: bool = False):
        h = self.hidden_size
        emb = nn.Embed(self.vocab_size, h, name="embedding")(txt_tokens)
        x = PreNet(h, h // 2, name="pre_net")(emb, train=train)
        x = CBHG(bank_k=16, channels=h // 2, proj_channels=(h // 2, h // 2),
                 name="cbhg")(x)
        x = nn.Dense(h, name="proj_out")(x)
        mask = (txt_tokens > 0)[:, :, None].astype(x.dtype)
        return x * mask


class RNNEncoder(nn.Module):
    """Tacotron2: embed -> 3 convs -> BiLSTM-ish (BiGRU) (rnn.py:173-209)."""

    vocab_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, txt_tokens, train: bool = False):
        h = self.hidden_size
        x = nn.Embed(self.vocab_size, h, name="embedding")(txt_tokens)
        for i in range(3):
            x = nn.Conv(h, (5,), padding="SAME", name=f"conv_{i}")(x)
            x = nn.relu(nn.LayerNorm(name=f"norm_{i}")(x))
            x = nn.Dropout(0.5, deterministic=not train)(x)
        x = BiGRU(h // 2, name="rnn")(x)
        mask = (txt_tokens > 0)[:, :, None].astype(x.dtype)
        return x * mask


class DecoderRNN(nn.Module):
    """Frame-level decoder: PreNet-less 2-layer BiGRU stack (rnn.py:212-261
    role: the 'rnn' decoder_type of FastSpeech)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.hidden_size
        x = BiGRU(h // 2, name="rnn1")(x)
        x = BiGRU(h // 2, name="rnn2")(x)
        return nn.Dense(h, name="proj")(x)
