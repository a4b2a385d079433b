"""Host-side training/eval/test loop around the jitted sharded train step.

Replaces the reference's 560-line Lightning-clone Trainer
(``utils/commons/trainer.py``): the per-step hot path (forward, loss, grads,
all-reduce, clip, optimizer) is ONE XLA program (``make_train_step``); this
module only feeds batches, schedules validation/checkpoints, and logs.

Feature parity: endless epoch loop with per-step val checks (:256-303),
sanity validation (:259-261), rolling + best checkpointing (:431-470),
auto-resume from last checkpoint (:153-163), TensorBoard scalar logging
(:505-536), test loop writing generated wavs + masked-region segments
(``tasks/speech_editing/speech_editing_base.py:151-192``).
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

import numpy as np

from speech_editing_tpu.data.datasets import DataLoader
from speech_editing_tpu.parallel.mesh import (make_mesh, pad_batch_to_multiple,
                                              shard_batch)
from speech_editing_tpu.training.checkpoint import (get_last_checkpoint,
                                                    load_checkpoint,
                                                    restore_state,
                                                    save_checkpoint)
from speech_editing_tpu.training.optim import build_optimizer
from speech_editing_tpu.training.train_state import (TrainState,
                                                     make_eval_step,
                                                     make_train_step)


class TensorBoardLogger:
    """Thin SummaryWriter wrapper; silently no-ops without tensorboard
    (or with ``log_dir=None`` — non-main processes in multi-host runs)."""

    def __init__(self, log_dir: Optional[str]):
        self.writer = None
        if log_dir is None:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_scalar(self, tag, value, step):
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), int(step))

    def add_audio(self, tag, wav, step, sr):
        if self.writer is not None:
            import torch

            self.writer.add_audio(tag, torch.tensor(np.asarray(wav))[None],
                                  int(step), sample_rate=int(sr))

    def add_figure(self, tag, fig, step):
        if self.writer is not None:
            self.writer.add_figure(tag, fig, int(step))


class Trainer:
    def __init__(self, task, hp: Any, work_dir: Optional[str] = None):
        import jax

        self.task = task
        self.hp = hp
        self.work_dir = work_dir or hp.get("work_dir") or os.path.join(
            "checkpoints", hp.get("exp_name", "default"))
        os.makedirs(self.work_dir, exist_ok=True)
        self.tp_size = int(hp.get("tp_size", 1))
        if self.tp_size > 1:
            from speech_editing_tpu.parallel.tp import make_tp_mesh

            self.mesh = make_tp_mesh(tp=self.tp_size)
        else:
            self.mesh = make_mesh()
        # batch padding/sharding granularity = data-axis size (with TP the
        # model axis sees the same batch shard, so only "data" splits it)
        self.n_dev = int(self.mesh.shape.get("data", 1))
        # multi-host (jax.distributed initialized before Trainer): every
        # process runs this same loop SPMD-style over the global mesh;
        # file/terminal output is gated to process 0 (reference rank-0
        # gating, trainer.py:176-180,431-449)
        self.n_proc = jax.process_count()
        self.is_main = jax.process_index() == 0
        self.model = task.build_model()
        self.rng = jax.random.PRNGKey(int(hp.get("seed", 1234)))
        self.state: Optional[TrainState] = None
        self.global_step = 0
        self.logger = TensorBoardLogger(
            os.path.join(self.work_dir, "tb_logs") if self.is_main else None)
        self._infer_fn = None
        self._val_vocoder = None

    def _print(self, *args, **kw):
        if self.is_main:
            print(*args, **kw)

    def _split_rng(self):
        """Advance the (process-identical) rng; the returned subkey is host
        numpy under multi-host so the global-mesh jit can place it (a
        process-local committed device array would conflict)."""
        import jax

        self.rng, sub = jax.random.split(self.rng)
        return np.asarray(sub) if self.n_proc > 1 else sub

    # -- data ---------------------------------------------------------------
    def _loader(self, prefix: str, shuffle: bool, endless: bool = False,
                max_sentences_key: str = "max_sentences") -> DataLoader:
        hp = self.hp
        ds = self.task.dataset_cls(prefix, hp, shuffle=shuffle)
        max_sent = hp.get(max_sentences_key, 16)
        if max_sent in (-1, None):
            max_sent = hp.get("max_sentences", 16)
        return DataLoader(
            ds,
            max_tokens=hp.get("max_tokens"),
            max_sentences=max_sent,
            required_batch_size_multiple=self.n_dev if prefix == "train" else 1,
            endless=endless,
            # worker processes only for the training stream (reference
            # ds_workers); val/test stay in-process for determinism of order
            num_workers=int(hp.get("ds_workers", 0)) if prefix == "train"
            else 0)

    def _device_batch(self, raw: dict) -> dict:
        keys = self.task.effective_batch_keys()
        batch = {k: raw[k] for k in keys if k in raw}
        batch = pad_batch_to_multiple(batch, self.n_dev)
        return shard_batch(batch, self.mesh)

    # -- setup --------------------------------------------------------------
    def _build_state(self, first_batch: dict):
        """``first_batch`` is the RAW host (numpy) batch: init runs locally
        and deterministically on every process (same seed -> identical
        params), then the state is replicated over the global mesh."""
        import jax

        if getattr(self.task, "is_gan", False):
            return self._build_gan_state(first_batch)
        tx = build_optimizer(self.hp)
        self.tx = tx
        self.loss_fn = self.task.make_loss_fn(self.model)
        ckpt_path, steps = get_last_checkpoint(self.work_dir)
        init_rng = self._split_rng()
        variables = self.task.init_model(self.model, first_batch, init_rng)
        param_specs = None
        if self.tp_size > 1:
            from speech_editing_tpu.parallel.tp import param_partition_specs

            param_specs = param_partition_specs(variables["params"],
                                                self.tp_size)
        self.train_step = make_train_step(
            self.loss_fn, tx, mesh=self.mesh,
            use_bf16=bool(self.hp.get("use_bf16", False)),
            param_specs=param_specs)
        # validation runs the deterministic-dropout variant of the loss
        self.eval_step = make_eval_step(
            self.task.make_loss_fn(self.model, train=False), mesh=self.mesh)
        state = TrainState.create(variables["params"], tx)
        if ckpt_path is not None:
            payload = load_checkpoint(ckpt_path)
            state = restore_state(payload, state)
            self.global_step = payload["steps"]
            self._print(f"| loaded checkpoint {ckpt_path} "
                        f"(step {self.global_step})")
        if self.n_proc > 1:
            # multi-host: process-local init / host-numpy restore -> one
            # replicated global array set (TP re-shards via the train
            # step's param constraints on first use)
            from speech_editing_tpu.parallel.mesh import replicate_tree

            state = replicate_tree(state, self.mesh)
        self.state = state
        n_params = sum(x.size for x in jax.tree.leaves(state.params))
        mesh_desc = "x".join(f"{a}={s}" for a, s in self.mesh.shape.items())
        self._print(f"| model params: {n_params / 1e6:.3f}M | mesh: {mesh_desc}"
                    + (f" | processes: {self.n_proc}" if self.n_proc > 1
                       else ""))

    def _build_gan_state(self, first_batch: dict):
        """Two-TrainState GAN setup (vocoder): fused gen+disc step."""
        import jax

        disc = self.task.build_discriminators()
        init_rng = self._split_rng()
        state = self.task.init_gan_state(self.model, disc, first_batch, init_rng)
        self.train_step = self.task.make_gan_train_step(self.model, disc,
                                                        mesh=self.mesh)
        self.eval_step = self.task.make_gan_eval_step(self.model, disc,
                                                      mesh=self.mesh)
        ckpt_path, steps = get_last_checkpoint(self.work_dir)
        if ckpt_path is not None:
            payload = load_checkpoint(ckpt_path)
            state = restore_state(payload, state)
            self.global_step = payload["steps"]
            self._print(f"| loaded checkpoint {ckpt_path} "
                        f"(step {self.global_step})")
        if self.n_proc > 1:
            from speech_editing_tpu.parallel.mesh import replicate_tree

            state = replicate_tree(state, self.mesh)
        self.state = state
        n_params = sum(x.size for x in jax.tree.leaves(state.gen_params))
        self._print(f"| generator params: {n_params / 1e6:.3f}M "
                    f"| devices: {self.n_dev}")

    def _start_logging(self):
        """Terminal tee + source snapshot (reference trainer.py:538-559).
        Process-0 only: mirrors the reference's rank-0 file outputs."""
        import shutil
        import time as _time

        if not self.is_main:
            return
        hp = self.hp
        ts = _time.strftime("%Y%m%d%H%M%S")
        log_dir = os.path.join(self.work_dir, "terminal_logs")
        os.makedirs(log_dir, exist_ok=True)
        from speech_editing_tpu.utils.meters import Tee

        self._tee = Tee(os.path.join(log_dir, f"log_{ts}.txt"))
        if hp.get("save_codes"):
            src = os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            dst = os.path.join(self.work_dir, "codes", ts)
            shutil.copytree(os.path.join(src, "speech_editing_tpu"),
                            os.path.join(dst, "speech_editing_tpu"),
                            ignore=shutil.ignore_patterns("__pycache__"),
                            dirs_exist_ok=True)
            print(f"| source snapshot -> {dst}")

    # -- train --------------------------------------------------------------
    def fit(self):
        import jax

        hp = self.hp
        self._start_logging()
        max_updates = int(hp.get("max_updates", 100000))
        val_interval = int(hp.get("val_check_interval", 2000))
        tb_interval = int(hp.get("tb_log_interval", 100))
        num_sanity = int(hp.get("num_sanity_val_steps", 5))
        accum = int(hp.get("accumulate_grad_batches", 1) or 1)

        loader = self._loader("train", shuffle=True, endless=True)
        try:  # covers ds_workers pool from its very first fork (next(it))
            it = iter(loader)
            raw_first = next(it)
            # init sees the RAW host batch (local + deterministic on every
            # process); the device batch is built after for the first step
            self._build_state(raw_first)
            first = self._device_batch(raw_first)

            if num_sanity > 0:
                self.validate(max_batches=num_sanity, log=False)

            use_accum = accum > 1 and not getattr(self.task, "is_gan", False)
            grad_fn = apply_fn = None
            if use_accum:
                from speech_editing_tpu.training.train_state import \
                    make_accum_train_step

                grad_fn, apply_fn = make_accum_train_step(
                    self.loss_fn, self.tx, mesh=self.mesh,
                    use_bf16=bool(self.hp.get("use_bf16", False)))

            t0 = time.time()
            pending = first
            self._train_loop(it, pending, max_updates, val_interval,
                             tb_interval, accum, use_accum,
                             grad_fn, apply_fn,
                             t0)
        except KeyboardInterrupt:
            # save before exiting (reference base_task.py:231 hook)
            if self.state is not None:
                self._print("| KeyboardInterrupt: saving checkpoint before exit")
                save_checkpoint(self.work_dir, self.state, self.global_step,
                                num_ckpt_keep=int(hp.get("num_ckpt_keep", 3)))
            raise
        finally:
            loader.close()  # shut down ds_workers processes promptly
        # final checkpoint
        save_checkpoint(self.work_dir, self.state, self.global_step,
                        num_ckpt_keep=int(hp.get("num_ckpt_keep", 3)))
        self._print(f"| training done at step {self.global_step}")
        if getattr(self, "_tee", None) is not None:
            self._tee.close()
            self._tee = None

    def _train_loop(self, it, pending, max_updates, val_interval,
                    tb_interval, accum, use_accum, grad_fn, apply_fn, t0):
        import jax

        hp = self.hp
        while self.global_step < max_updates:
            if use_accum:
                # true accumulation: mean gradient over microbatches,
                # ONE optimizer update (reference trainer.py:366-374)
                grads_sum, metrics_acc = None, None
                for _ in range(accum):
                    batch = (pending if pending is not None
                             else self._device_batch(next(it)))
                    pending = None
                    sub = self._split_rng()
                    grads, metrics_acc = grad_fn(
                        self.state.params, batch, sub,
                        float(self.global_step))
                    grads_sum = grads if grads_sum is None else jax.tree.map(
                        jax.numpy.add, grads_sum, grads)
                self.state, apply_metrics = apply_fn(
                    self.state, grads_sum, float(accum))
                metrics_acc = dict(metrics_acc, **apply_metrics)
            else:
                batch = (pending if pending is not None
                         else self._device_batch(next(it)))
                pending = None
                sub = self._split_rng()
                self.state, metrics_acc = self.train_step(self.state, batch, sub)
            self.global_step += 1

            if self.global_step % tb_interval == 0:
                m = {k: float(v) for k, v in metrics_acc.items()}
                dt = time.time() - t0
                sps = tb_interval / max(dt, 1e-9)
                t0 = time.time()
                msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
                self._print(f"| step {self.global_step} | {sps:.2f} it/s | {msg}")
                # NaN tripwire (reference trainer.py:356-363): the jitted
                # step already skipped the bad update; here we only escalate.
                if m.get("nan_grads", 0) > 0:
                    self._nan_intervals = getattr(self, "_nan_intervals", 0) + 1
                    self._print(f"| WARNING: non-finite gradients at step "
                          f"{self.global_step}; update was skipped "
                          f"({self._nan_intervals} consecutive intervals)")
                    if self._nan_intervals >= int(
                            hp.get("max_nan_intervals", 5)):
                        raise RuntimeError(
                            "gradients non-finite for "
                            f"{self._nan_intervals} consecutive log "
                            "intervals; aborting (set max_nan_intervals "
                            "to tune)")
                else:
                    self._nan_intervals = 0
                for k, v in m.items():
                    self.logger.add_scalar(f"tr/{k}", v, self.global_step)
                self.logger.add_scalar("tr/it_per_sec", sps, self.global_step)

            if self.global_step % val_interval == 0:
                val_loss = self.validate()
                save_checkpoint(
                    self.work_dir, self.state, self.global_step,
                    val_loss=val_loss,
                    num_ckpt_keep=int(hp.get("num_ckpt_keep", 3)),
                    save_best=bool(hp.get("save_best", False)))

    def validate_only(self):
        """--validate: restore the last checkpoint and run one validation."""
        loader = self._loader("valid", shuffle=False,
                              max_sentences_key="max_valid_sentences")
        first = None
        for first in loader:
            break
        if first is None:
            self._print("| empty valid set")
            return None
        self._build_state(first)
        return self.validate()

    # -- validation ---------------------------------------------------------
    def validate(self, max_batches: Optional[int] = None, log: bool = True):
        import jax

        hp = self.hp
        if max_batches is None:
            mb = int(hp.get("eval_max_batches", -1))
            max_batches = None if mb == -1 else mb
        loader = self._loader("valid", shuffle=False,
                              max_sentences_key="max_valid_sentences")
        totals: dict = {}
        n = 0
        first_raw = None
        for i, raw in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            if first_raw is None:
                first_raw = raw
            batch = self._device_batch(raw)
            sub = self._split_rng()
            metrics = self.eval_step(self.state.params, batch, sub)
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
        if n == 0:
            return None
        means = {k: v / n for k, v in totals.items()}
        val_loss = means.get("total_loss")
        if log:
            msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
            self._print(f"| validation @ step {self.global_step}: {msg}")
            for k, v in means.items():
                self.logger.add_scalar(f"val/{k}", v, self.global_step)
            # media runs process-local inference; keep the rng split on all
            # processes (stream stays identical) but render on main only
            do_media = (first_raw is not None
                        and int(hp.get("num_valid_plots", 0)) > 0)
            if do_media:
                sub = self._split_rng()
                if self.is_main:
                    try:
                        self._log_valid_media(first_raw, sub)
                    except Exception as e:  # plots must never kill training
                        self._print(f"| WARN valid media logging failed: {e}")
        return val_loss

    def _local_params(self):
        """Params usable by process-local (unmeshed) jits: under multi-host
        the replicated global arrays are read back to host numpy first."""
        if self.n_proc > 1:
            from speech_editing_tpu.parallel.mesh import to_host_local

            return to_host_local(self.state.params)
        return self.state.params

    def _log_valid_media(self, raw: dict, sub):
        """Mel figure + vocoded audio for the first val item
        (reference speech_base.py:259-281 / spec_denoiser.py plot_wav)."""
        import jax.numpy as jnp

        if getattr(self.task, "is_gan", False):
            return
        if self._infer_fn is None:
            self._infer_fn = self.task.build_infer_fn(self.model)
        keys = self.task.effective_batch_keys()
        batch = {k: jnp.asarray(raw[k]) for k in keys if k in raw}
        out = self._infer_fn({"params": self._local_params()}, batch, sub)
        mel_pred = np.asarray(out["mel_out"])[0]
        mel_gt = np.asarray(raw["mels"])[0]
        from speech_editing_tpu.utils.plot import spec_to_figure

        self.logger.add_figure(
            f"mel_val_0", spec_to_figure(
                np.concatenate([mel_gt, mel_pred], -1),
                vmin=self.hp.get("mel_vmin", -6),
                vmax=self.hp.get("mel_vmax", 1.5)), self.global_step)
        if self.global_step > 0 and self.hp.get("valid_infer_interval"):
            from speech_editing_tpu.infer.vocoder import get_vocoder_cls

            if self._val_vocoder is None:
                self._val_vocoder = get_vocoder_cls(
                    self.hp.get("vocoder", "GriffinLim"))(self.hp)
            sr = int(self.hp["audio_sample_rate"])
            self.logger.add_audio("wav_val_0",
                                  self._val_vocoder.spec2wav(mel_pred),
                                  self.global_step, sr)

    # -- test / inference ---------------------------------------------------
    def test(self):
        import jax

        if self.n_proc > 1:
            # _build_state would replicate onto the GLOBAL mesh — a
            # collective that deadlocks when the non-main processes return
            # early below. Inference is single-process by design (the
            # reference's test loop is rank-0-only too); fail loudly on
            # every process instead of hanging the job.
            raise RuntimeError(
                "Trainer.test/--infer must run single-process: launch it "
                "without jax.distributed (checkpoints are portable across "
                "process counts). A multi-host --infer would deadlock in "
                "global-mesh state replication.")
        if not self.is_main:
            # test inference is process-local (batch-size-1 style, no mesh
            # collectives): only process 0 generates + writes outputs
            return None
        hp = self.hp
        loader = self._loader("test", shuffle=False,
                              max_sentences_key="max_valid_sentences")
        ckpt_path, steps = get_last_checkpoint(self.work_dir)
        first_raw = None
        for first_raw in loader:
            break
        if first_raw is None:
            print("| empty test set")
            return
        self._build_state(first_raw)
        infer_fn = self.task.build_infer_fn(self.model)

        from speech_editing_tpu.infer.vocoder import get_vocoder_cls
        from speech_editing_tpu.training.result_saver import save_test_result
        from speech_editing_tpu.utils.multiprocess import ResultSaverPool

        vocoder = get_vocoder_cls(hp.get("vocoder", "GriffinLim"))(hp)
        gen_dir = os.path.join(
            self.work_dir,
            f"generated_{self.global_step}_{hp.get('gen_dir_name') or 'test'}")
        os.makedirs(os.path.join(gen_dir, "wavs"), exist_ok=True)
        os.makedirs(os.path.join(gen_dir, "plot"), exist_ok=True)
        sr = int(hp["audio_sample_rate"])
        # async result writer: wav encode + matplotlib render overlap the
        # inference/vocode loop (reference speech_base.py:287 worker pool);
        # N_PROC<=1 falls back to synchronous writes
        saver = ResultSaverPool(hp.get("test_save_workers"))
        hp_plot = {"hop_size": int(hp.get("hop_size", 256)),
                   "mel_vmin": hp.get("mel_vmin", -6),
                   "mel_vmax": hp.get("mel_vmax", 1.5)}
        token_encoder = getattr(self.task, "token_encoder", None)

        loader = self._loader("test", shuffle=False,
                              max_sentences_key="max_valid_sentences")
        n_done = 0
        test_num = int(hp.get("test_num", 100))
        variables = {"params": self._local_params()}
        for raw in loader:
            if n_done >= test_num:
                break
            keys = self.task.effective_batch_keys()
            batch = {k: raw[k] for k in keys if k in raw}
            import jax.numpy as jnp

            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            sub = self._split_rng()
            out = infer_fn(variables, batch, sub)
            mel_pred = np.asarray(out["mel_out"])
            masks = (np.asarray(raw["time_mel_masks"])
                     if "time_mel_masks" in raw else None)
            wavs_out = (np.asarray(out["wav_out"])
                        if "wav_out" in out else None)
            mel_lens = raw.get("mel_lengths",
                               [mel_pred.shape[1]] * mel_pred.shape[0])
            for b in range(mel_pred.shape[0]):
                if n_done >= test_num:
                    break
                item_name = raw["item_name"][b]
                t_len = int(mel_lens[b])
                mel_p = mel_pred[b, :t_len]
                mel_g = np.asarray(raw["mels"])[b, :t_len]
                wav_p = (wavs_out[b][: t_len * int(hp.get("hop_size", 256))]
                         if wavs_out is not None
                         else vocoder.spec2wav(mel_p))
                str_phs = None
                if token_encoder is not None and "txt_tokens" in raw:
                    toks = [int(t) for t in np.asarray(raw["txt_tokens"])[b]
                            if t > 0]
                    str_phs = token_encoder.decode(toks)
                m2p = (np.asarray(raw["mel2ph"])[b, :t_len]
                       if "mel2ph" in raw else None)
                # vocode in the loop (device work); file writes + plot
                # rendering go to the saver pool
                saver.add_job(save_test_result, (
                    wav_p, mel_p, f"[P]{item_name}", gen_dir, sr, hp_plot,
                    str_phs, m2p, True))
                if hp.get("save_gt", True):
                    saver.add_job(save_test_result, (
                        vocoder.spec2wav(mel_g), mel_g, f"[G]{item_name}",
                        gen_dir, sr, hp_plot, str_phs, m2p, False))
                # masked-region-only segments (reference
                # speech_editing_base.py:171-182) for MCD/PESQ/STOI eval
                seg = (masks[b, :t_len] == 1) if masks is not None else None
                if seg is not None and seg.any():
                    saver.add_job(save_test_result, (
                        vocoder.spec2wav(mel_p[seg]), None,
                        f"[P_SEG]{item_name}", gen_dir, sr))
                    saver.add_job(save_test_result, (
                        vocoder.spec2wav(mel_g[seg]), None,
                        f"[G_SEG]{item_name}", gen_dir, sr))
                n_done += 1
        saver.drain()
        # meta.csv index of generated items (reference speech_base.py:377)
        import csv as _csv

        metas = sorted(f[3:-8] for f in os.listdir(f"{gen_dir}/wavs")
                       if f.startswith("[P]") and f.endswith("_mel.npy"))
        with open(f"{gen_dir}/meta.csv", "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["item_name", "wav_fn_pred", "wav_fn_gt"])
            for name in metas:
                w.writerow([name, f"wavs/[P]{name}.wav", f"wavs/[G]{name}.wav"])
        print(f"| test done: {n_done} items -> {gen_dir}")
        return gen_dir
