"""Task protocol: what a model family contributes to the generic trainer.

Keeps the reference's hook vocabulary (``utils/commons/base_task.py``:
build_model / losses / datasets / start) but as a thin declarative object —
the training loop itself is the pure sharded train step in
``training/train_state.py`` driven by ``training/trainer.Trainer``.

``task_cls`` strings in egs YAMLs resolve to these classes
(reference ``tasks/run.py:9-14`` dynamic import surface).
"""

from __future__ import annotations

import importlib
import os
from typing import Any, Optional, Sequence

import numpy as np

from speech_editing_tpu.data.datasets import EditingDataset


class BaseTask:
    dataset_cls = EditingDataset
    # array keys moved to device for the train step
    array_batch_keys: Sequence[str] = (
        "txt_tokens", "mels", "mel2ph", "f0", "uv", "time_mel_masks")

    def __init__(self, hp: Any):
        self.hp = hp
        self.token_encoder = self._load_token_encoder()
        if self.token_encoder is not None:
            self.vocab_size = self.token_encoder.vocab_size
        else:
            self.vocab_size = int(hp.get("vocab_size", 100))

    # -- vocab ---------------------------------------------------------------
    def _load_token_encoder(self):
        from speech_editing_tpu.utils.text.text_encoder import build_token_encoder
        data_dir = self.hp.get("binary_data_dir", "")
        fn = os.path.join(data_dir, "phone_set.json") if data_dir else ""
        if fn and os.path.exists(fn):
            return build_token_encoder(fn)
        return None

    @property
    def sil_token_ids(self) -> tuple:
        if self.token_encoder is None:
            return ()
        ids = []
        for p in self.token_encoder.sil_phonemes():
            ids.extend(self.token_encoder.encode(p))
        return tuple(sorted(set(ids)))

    def effective_batch_keys(self) -> tuple:
        keys = list(self.array_batch_keys)
        if self.hp.get("use_spk_embed"):
            keys.append("spk_embed")
        if self.hp.get("use_spk_id"):
            keys.append("spk_ids")
        return tuple(keys)

    # -- model/loss hooks (implemented per task) -----------------------------
    def build_model(self):
        raise NotImplementedError

    def make_loss_fn(self, model, train: bool = True):
        """Loss closure; ``train=False`` builds the validation variant
        (deterministic dropout) used by the eval step."""
        raise NotImplementedError

    def init_model(self, model, batch, rng):
        """Default init for editing models (txt/mask/mel2ph/spk/mels/f0/uv).
        init is jitted: eager initialisation dispatches thousands of tiny
        ops and is orders of magnitude slower on CPU."""
        import jax
        import jax.numpy as jnp

        k1, k2 = jax.random.split(rng)
        return jax.jit(model.init)(
            {"params": k1, "diffusion": k2},
            jnp.asarray(batch["txt_tokens"]),
            jnp.asarray(batch["time_mel_masks"])[..., None].astype(jnp.float32),
            jnp.asarray(batch["mel2ph"]),
            jnp.asarray(batch["spk_embed"]) if "spk_embed" in batch else None,
            jnp.asarray(batch["mels"]),
            jnp.asarray(batch["f0"]), jnp.asarray(batch["uv"]))

    def build_infer_fn(self, model):
        """Returns fn(variables, batch, rng) -> model_out dict with
        'mel_out' composited only inside the mask at the call site."""
        import jax

        def infer_fn(variables, batch, rng):
            tm = batch["time_mel_masks"][..., None].astype("float32")
            out = model.apply(
                variables, batch["txt_tokens"], tm, batch["mel2ph"],
                batch.get("spk_embed"), batch["mels"], batch["f0"],
                batch["uv"], infer=True, rng=rng)
            out["mel_out"] = (out["mel_out"] * tm
                              + batch["mels"] * (1 - tm))
            return out

        return jax.jit(infer_fn)

    # -- entry ---------------------------------------------------------------
    @classmethod
    def start(cls, hp: Optional[Any] = None):
        from speech_editing_tpu.config.hparams import set_hparams
        from speech_editing_tpu.training.trainer import Trainer

        if hp is None:
            hp = set_hparams()
        np.random.seed(int(hp.get("seed", 1234)))
        task = cls(hp)
        trainer = Trainer(task, hp)
        if hp.get("infer"):
            trainer.test()
        elif hp.get("validate"):
            trainer.validate_only()
        else:
            trainer.fit()
        return trainer


def import_task_cls(path: str):
    """Resolve 'pkg.mod.Cls' task_cls strings (reference run.py:9-14)."""
    pkg, cls_name = path.rsplit(".", 1)
    return getattr(importlib.import_module(pkg), cls_name)
