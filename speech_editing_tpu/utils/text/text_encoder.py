"""Token/text encoders for phoneme and word vocabularies.

Capability-parity with the reference ``utils/text/text_encoder.py:6-263``:
reserved ids ``<pad>=0, <EOS>=1, <UNK>=2``, whitespace-token encoding with
optional OOV replacement, JSON-vocab loading, and silence-phoneme helpers.
Implementation is original and minimal — encoders are host-side objects; the
device side only ever sees integer id arrays.
"""

from __future__ import annotations

import json

PAD, EOS, UNK = "<pad>", "<EOS>", "<UNK>"
RESERVED_TOKENS = [PAD, EOS, UNK]
PAD_ID, EOS_ID, UNK_ID = 0, 1, 2


def is_sil_phoneme(p: str) -> bool:
    """A silence-ish phoneme is empty or starts with a non-letter.

    Matches reference ``text_encoder.py:262``.
    """
    return p == "" or not p[0].isalpha()


class TokenTextEncoder:
    """Encoder mapping space-separated tokens <-> integer ids."""

    def __init__(self, vocab_list: list[str], replace_oov: str | None = UNK):
        self._replace_oov = replace_oov
        # vocab_list must not contain the reserved tokens
        self.vocab = RESERVED_TOKENS + [t for t in vocab_list if t not in RESERVED_TOKENS]
        self._token_to_id = {t: i for i, t in enumerate(self.vocab)}
        self._id_to_token = {i: t for i, t in enumerate(self.vocab)}

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def __len__(self):
        return self.vocab_size

    def encode(self, s: str) -> list[int]:
        toks = s.strip().split(" ") if s.strip() else []
        ids = []
        for t in toks:
            if t not in self._token_to_id:
                if self._replace_oov is None:
                    raise KeyError(f"OOV token {t!r}")
                t = self._replace_oov
            ids.append(self._token_to_id[t])
        return ids

    def decode(self, ids, strip_eos: bool = False, strip_padding: bool = False) -> str:
        ids = list(ids)
        if strip_padding and PAD_ID in ids:
            ids = ids[: ids.index(PAD_ID)]
        if strip_eos and EOS_ID in ids:
            ids = ids[: ids.index(EOS_ID)]
        return " ".join(self._id_to_token.get(int(i), UNK) for i in ids)

    def pad(self) -> int:
        return PAD_ID

    def eos(self) -> int:
        return EOS_ID

    def unk(self) -> int:
        return UNK_ID

    def sil_phonemes(self) -> list[str]:
        return [t for t in self.vocab if is_sil_phoneme(t)]

    def store_to_file(self, filename: str):
        with open(filename, "w") as f:
            json.dump(self.vocab[len(RESERVED_TOKENS):], f, ensure_ascii=False)


def build_token_encoder(token_list_file: str) -> TokenTextEncoder:
    """Load an encoder from a JSON list of tokens (reference :257)."""
    with open(token_list_file) as f:
        vocab = json.load(f)
    return TokenTextEncoder(vocab, replace_oov=UNK)
