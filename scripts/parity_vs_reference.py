"""Measured output parity vs the PyTorch reference, ALL editing families
(VERDICT r1 item #2; extended per VERDICT r2 #2 with ``--model``).

Protocol (all on the structured synthetic corpus, since the released
checkpoints are not fetchable in this environment):

1. Train the *reference* torch model (imported from /root/reference, never
   copied) for a few hundred CPU Adam steps with the reference task's loss
   semantics (masked mel losses; + dur/pitch for the conditioner families).
2. Convert the trained state_dict with the same
   ``utils.convert_torch_ckpt`` converters that load released checkpoints.
3. Run the SAME region edits (contiguous 50% phone-span inference masks,
   ``utils/spec_aug/time_mask.py:72-93`` semantics) through BOTH frameworks
   — with the SAME injected reverse-diffusion noise for the diffusion
   families (spec_denoiser / stutter_speech); campnet / a3t / editspeech
   are deterministic at inference — and measure:
     - mel-MCD between the two frameworks' edited outputs (the
       implementation-parity number; identical weights (+ noise) ->
       should be ~0 dB),
     - masked-region mel-MCD vs ground truth for each framework (the
       quality-parity delta; target <= 0.5 dB apart),
     - wav-domain MCD/STOI (and PESQ when available) of griffin-lim-vocoded
       [P_SEG]/[G_SEG] pairs per framework via ``evals.get_metrics``.

``--model {spec_denoiser,campnet,a3t,editspeech,stutter_speech}`` selects
the family. Emits one JSON report (default
/tmp/parity_vs_reference_<model>.json) and a markdown table on stdout for
PARITY_MEASURED.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

HP = {
    "hidden_size": 64, "enc_layers": 2, "dec_layers": 2,
    "enc_ffn_kernel_size": 9, "dec_ffn_kernel_size": 9, "num_heads": 2,
    "encoder_type": "fft", "decoder_type": "fft",
    "audio_num_mel_bins": 80, "use_spk_id": False, "use_spk_embed": False,
    "predictor_hidden": -1, "dur_predictor_layers": 2,
    "dur_predictor_kernel": 3, "predictor_dropout": 0.5,
    "use_pitch_embed": True, "predictor_kernel": 5,
    "dec_inp_add_noise": False, "predictor_grad": 0.1,
    "pitch_type": "frame", "use_uv": True, "frames_multiple": 1,
    "residual_layers": 8, "residual_channels": 48,
    "dilation_cycle_length": 1, "keep_bins": 80,
    "schedule_type": "vpsde", "timesteps": 8, "timescale": 1,
    "diff_loss_type": "l1", "use_masked_cond": True,
}
VOCAB = 12


FAMILY_HP = {
    "spec_denoiser": {},
    "stutter_speech": {},
    "campnet": {"use_spk_embed": True, "use_pitch_embed": False},
    "a3t": {"use_pitch_embed": False},
    "editspeech": {"encoder_type": "conv", "use_pitch_embed": False,
                   "lstm_hidden": 128},
}


def family_hp(model: str) -> dict:
    hp = dict(HP, num_spk=1, dropout=0.0, enc_dilations=[1, 1],
              enc_kernel_size=5, layers_in_block=2, enc_dec_norm="ln",
              enc_post_net_kernel=3)
    hp.update(FAMILY_HP[model])
    return hp


def build_reference(model: str, hp: dict):
    """Import + construct the reference torch model (never copied)."""
    from helpers import stub_reference_deps

    stub_reference_deps()
    sys.path.insert(0, REF)
    import torch

    import utils.commons.hparams as ref_hparams  # type: ignore

    ref_hparams.hparams.update(hp)
    torch.manual_seed(0)
    spec_minmax = dict(spec_min=[-6.0] * 80, spec_max=[1.0] * 80)
    if model == "spec_denoiser":
        from modules.speech_editing.spec_denoiser.diffnet import \
            DiffNet  # type: ignore
        from modules.speech_editing.spec_denoiser.spec_denoiser import \
            GaussianDiffusion as RefGD  # type: ignore

        return RefGD(phone_encoder=list(range(VOCAB)), out_dims=80,
                     denoise_fn=DiffNet(80), timesteps=hp["timesteps"],
                     time_scale=hp["timescale"], loss_type="l1",
                     **spec_minmax)
    if model == "stutter_speech":
        from modules.speech_editing.stutter_speech.diffnet import \
            DiffNet  # type: ignore
        from modules.speech_editing.stutter_speech.spec_denoiser import \
            GaussianDiffusion as RefSGD  # type: ignore

        return RefSGD(phone_encoder=list(range(VOCAB)), out_dims=80,
                      denoise_fn=DiffNet(80), timesteps=hp["timesteps"],
                      time_scale=hp["timescale"], loss_type="l1",
                      **spec_minmax)
    if model == "campnet":
        from modules.speech_editing.campnet.campnet import \
            CampNet as RefCampNet  # type: ignore

        return RefCampNet(VOCAB, VOCAB, ref_hparams.hparams)
    if model == "a3t":
        from modules.speech_editing.a3t.a3t import A3T as RefA3T  # type: ignore

        return RefA3T(VOCAB, VOCAB, ref_hparams.hparams)
    if model == "editspeech":
        from modules.speech_editing.editspeech.editspeech import \
            EditSpeech as RefES  # type: ignore
        from modules.speech_editing.editspeech.lstm import \
            LSTM_Seq2Seq  # type: ignore

        ref = RefES(list(range(VOCAB)), 80)
        # the reference hardcodes LSTM hidden 1024 (editspeech.py:25-27);
        # rebuild at lstm_hidden so CPU training finishes in minutes
        ref.decoder = LSTM_Seq2Seq(prenet_hidden_size=hp["hidden_size"],
                                   hidden_size=hp["lstm_hidden"],
                                   output_dim=80)
        return ref
    raise SystemExit(f"unknown model {model}")


def load_corpus(data_dir: str):
    from speech_editing_tpu.data.indexed_dataset import IndexedDataset
    from speech_editing_tpu.utils.audio.pitch import norm_interp_f0

    splits = {}
    for prefix in ("train", "test"):
        ds = IndexedDataset(f"{data_dir}/{prefix}")
        items = []
        for i in range(len(ds)):
            it = ds[i]
            f0, uv = norm_interp_f0(it["f0"])
            it["f0_norm"], it["uv"] = f0.astype(np.float32), uv.astype(np.float32)
            items.append(it)
        splits[prefix] = items
    return splits


def collate(items, rs, mask_mode: str):
    """Pad to batch; build time_mel_masks (train: alignment-aware 0.8,
    infer: contiguous 50% phone span — time_mask.py:50-93 semantics)."""
    b = len(items)
    s_max = max(len(it["ph_token"]) for it in items)
    t_max = max(len(it["mel2ph"]) for it in items)
    out = {
        "txt_tokens": np.zeros((b, s_max), np.int64),
        "mel2ph": np.zeros((b, t_max), np.int64),
        "f0": np.zeros((b, t_max), np.float32),
        "uv": np.zeros((b, t_max), np.float32),
        "mels": np.zeros((b, t_max, 80), np.float32),
        "time_mel_masks": np.zeros((b, t_max), np.float32),
        "dur_gt": np.zeros((b, s_max), np.float32),
    }
    for i, it in enumerate(items):
        s, t = len(it["ph_token"]), len(it["mel2ph"])
        out["txt_tokens"][i, :s] = it["ph_token"]
        out["mel2ph"][i, :t] = it["mel2ph"]
        out["f0"][i, :t] = it["f0_norm"]
        out["uv"][i, :t] = it["uv"]
        out["mels"][i, :t] = it["mel"]
        for ph in range(1, s + 1):
            out["dur_gt"][i, ph - 1] = (it["mel2ph"] == ph).sum()
        if mask_mode == "train":
            n_mask = max(1, int(round(0.8 * s)))
            phones = rs.choice(np.arange(1, s + 1), n_mask, replace=False)
            m = np.isin(it["mel2ph"], phones)
        else:  # contiguous 50% phone span (generate_inference_mask)
            span = max(1, int(round(0.5 * s)))
            start = int(rs.randint(1, s - span + 2))
            m = (it["mel2ph"] >= start) & (it["mel2ph"] < start + span)
        out["time_mel_masks"][i, :t] = m.astype(np.float32)
    # synthetic stutter labels (stutter_speech family): 0 fluent / 1
    # stutter / 2 pad — the synthetic corpus carries none, so draw them
    # deterministically from the shared rs stream
    stutter = (rs.rand(b, t_max) < 0.3).astype(np.int64)
    stutter[out["mel2ph"] == 0] = 2
    out["stutter_mel_masks"] = stutter
    return out


def reference_train_loss(model_name: str, ref, tt):
    """One training forward + loss with the reference task's semantics
    (masked mel losses; + dur/pitch for the conditioner families)."""
    import torch

    tmm = tt["time_mel_masks"][:, :, None]
    nonpad = (tt["mel2ph"] > 0).float()[:, :, None]
    tok_nonpad = (tt["txt_tokens"] > 0).float()

    def masked_l1(pred):
        return ((pred - tt["mels"]).abs() * tmm * nonpad).sum() \
            / (tmm * nonpad).sum().clamp(min=1) / 80

    def dur_mse(dur):
        return (((dur - tt["dur_gt"]) ** 2) * tok_nonpad).sum() \
            / tok_nonpad.sum()

    if model_name == "spec_denoiser":
        out = ref(tt["txt_tokens"], tmm, tt["mel2ph"], None,
                  ref_mels=tt["mels"], f0=tt["f0"], uv=tt["uv"], infer=False)
        f0_l1 = ((out["pitch_pred"][:, :, 0] - tt["f0"]).abs()
                 * nonpad[:, :, 0]).sum() / nonpad.sum()
        uv_bce = torch.nn.functional.binary_cross_entropy_with_logits(
            out["pitch_pred"][:, :, 1], tt["uv"], reduction="none")
        uv_bce = (uv_bce * nonpad[:, :, 0]).sum() / nonpad.sum()
        return (masked_l1(out["mel_out"]) + 0.1 * dur_mse(out["dur"])
                + 0.1 * f0_l1 + 0.1 * uv_bce)
    if model_name == "stutter_speech":
        out = ref(tt["txt_tokens"], tmm, tt["stutter_mel_masks"],
                  tt["mel2ph"], None, tt["mels"], tt["f0"], tt["uv"],
                  infer=False)
        ce = torch.nn.functional.cross_entropy(
            out["stutter_predictor_out"].transpose(1, 2),
            tt["stutter_mel_masks"].clamp(max=2))
        return (masked_l1(out["mel_out"]) + 0.1 * dur_mse(out["dur"])
                + 0.01 * ce)
    if model_name == "campnet":
        out = ref(tt["txt_tokens"], mels=tt["mels"], time_mel_masks=tmm)
        return masked_l1(out["mel_out_coarse"]) + masked_l1(out["mel_out_fine"])
    if model_name == "a3t":
        out = ref(tt["txt_tokens"], tt["mel2ph"], mels=tt["mels"],
                  time_mel_masks=tmm)
        return (masked_l1(out["mel_out_decoder"])
                + masked_l1(out["mel_out_postnet"]))
    if model_name == "editspeech":
        out = ref(tt["txt_tokens"], tmm, tt["mel2ph"], None,
                  ref_mels=tt["mels"], infer=False)
        return (masked_l1(out["forward_outputs"])
                + masked_l1(out["backward_outputs"])
                + 0.1 * dur_mse(out["dur"]))
    raise SystemExit(model_name)


def train_reference(model_name: str, ref, items, steps: int, seed: int = 0):
    import torch

    rs = np.random.RandomState(seed)
    opt = torch.optim.Adam(ref.parameters(), lr=2e-4, betas=(0.9, 0.98))
    ref.train()
    for step in range(steps):
        batch = collate([items[j] for j in
                         rs.choice(len(items), 6, replace=False)], rs, "train")
        tt = {k: torch.tensor(v) for k, v in batch.items()}
        loss = reference_train_loss(model_name, ref, tt)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 50 == 0 or step == steps - 1:
            print(f"  ref train step {step}: loss={loss.item():.4f}",
                  flush=True)
    ref.eval()


def reverse_loop_torch(ref, cond_btc, shape, noises):
    """Deterministic reference reverse process with injected noise
    (spec_denoiser.py:95-108 math, noise supplied explicitly)."""
    import torch

    x = torch.tensor(noises[0])  # [B, 1, 80, T]
    big_t = HP["timesteps"]
    b = shape[0]
    cond = cond_btc.transpose(1, 2)
    with torch.no_grad():
        for i in range(big_t - 1, -1, -1):
            t = torch.full((b,), i, dtype=torch.long)
            x0 = ref.denoise_fn(x, t, cond)
            mean, _, log_var = ref.q_posterior(x0, x, t)
            nz = 0.0 if i == 0 else 1.0
            x = mean + nz * (0.5 * log_var).exp() * torch.tensor(
                noises[big_t - i])
    return x.numpy()[:, 0].transpose(0, 2, 1)  # [B, T, 80]


def reverse_loop_flax(model, params, cond, sched, noises):
    """Same reverse process on our side: device denoise_fn + host posterior
    arithmetic with the same injected noises."""
    import jax.numpy as jnp

    x = noises[0][:, 0].transpose(0, 2, 1).copy()  # [B, T, 80]
    big_t = HP["timesteps"]
    b = x.shape[0]
    for i in range(big_t - 1, -1, -1):
        t = np.full((b,), i, np.int32)
        x0 = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                    jnp.asarray(t), cond,
                                    method=model.denoise))
        mean = (sched.posterior_mean_coef1[i] * x0
                + sched.posterior_mean_coef2[i] * x)
        nz = 0.0 if i == 0 else 1.0
        sigma = np.exp(0.5 * sched.posterior_log_variance_clipped[i])
        x = mean + nz * sigma * noises[big_t - i][:, 0].transpose(0, 2, 1)
    return x


def wav_metric_triple(fw_pairs, workdir: str, sr: int = 22050,
                      hop: int = 256, min_frames: int = 64) -> dict:
    """Vocode each framework's edited segments + the ground-truth segments
    with the SAME Griffin-Lim vocoder and run the reference acceptance
    triple (``eval/get_metrics.py:41-45`` semantics: MCD/STOI/PESQ over
    ``[G_SEG]``/``[P_SEG]`` pairs).

    Masked spans on the synthetic corpus can be shorter than STOI's
    30-frame analysis window, so each segment is grown symmetrically with
    ground-truth context up to ``min_frames`` — identical frame window for
    both frameworks and for the G_SEG, so the comparison stays paired.
    """
    from speech_editing_tpu.evals.get_metrics import compute_all
    from speech_editing_tpu.utils.audio.griffin_lim import mel2wav_griffin_lim
    from speech_editing_tpu.utils.audio.io import save_wav

    out = {}
    for name, pick in (("reference", lambda p: p[1]), ("ours", lambda p: p[0])):
        wdir = os.path.join(workdir, f"wavs_{name}")
        os.makedirs(wdir, exist_ok=True)
        for j, pair in enumerate(fw_pairs):
            comp, gt, m = pick(pair), pair[2], pair[3]
            t_len = len(m)
            idx = np.nonzero(m > 0)[0]
            lo, hi = int(idx[0]), int(idx[-1]) + 1
            while hi - lo < min(min_frames, t_len):
                lo, hi = max(0, lo - 1), min(t_len, hi + 1)
            for tag, mel in (("P_SEG", comp[lo:hi]), ("G_SEG", gt[lo:hi])):
                wav = mel2wav_griffin_lim(mel, sample_rate=sr, hop_size=hop)
                save_wav(wav, os.path.join(wdir, f"[{tag}]edit_{j}.wav"), sr)
        out[name] = compute_all(os.path.join(wdir, "*"))
        print(f"  wav triple [{name}]: " + "  ".join(
            f"{k}={v:.4f}" for k, v in out[name].items()), flush=True)
    return out


def convert_and_build(model_name: str, hp: dict, sd, first_batch):
    """Converted flax params + model for the family."""
    import jax
    import jax.numpy as jnp

    if model_name == "spec_denoiser":
        from speech_editing_tpu.models.spec_denoiser.spec_denoiser import \
            GaussianDiffusion
        from speech_editing_tpu.utils.convert_torch_ckpt import \
            convert_gaussian_diffusion

        return (GaussianDiffusion(vocab_size=VOCAB, hp=hp, out_dims=80),
                convert_gaussian_diffusion(sd, hp))
    if model_name == "stutter_speech":
        from speech_editing_tpu.models.stutter_speech import \
            StutterGaussianDiffusion
        from speech_editing_tpu.utils.convert_torch_ckpt import \
            convert_stutter_gaussian_diffusion

        return (StutterGaussianDiffusion(vocab_size=VOCAB, hp=hp, out_dims=80),
                convert_stutter_gaussian_diffusion(sd, hp))
    if model_name == "campnet":
        from speech_editing_tpu.models.campnet import CampNet
        from speech_editing_tpu.utils.convert_torch_ckpt import convert_campnet

        return (CampNet(vocab_size=VOCAB, hp=hp, out_dims=80),
                convert_campnet(sd, hp))
    if model_name == "a3t":
        from speech_editing_tpu.models.a3t import A3T
        from speech_editing_tpu.utils.convert_torch_ckpt import convert_a3t

        hp = dict(hp, espnet_bn_affine=True)  # folded eval-mode BN
        return A3T(vocab_size=VOCAB, hp=hp, out_dims=80), convert_a3t(sd, hp)
    if model_name == "editspeech":
        from speech_editing_tpu.models.editspeech import EditSpeech
        from speech_editing_tpu.utils.convert_torch_ckpt import (
            convert_editspeech, merge_params)

        model = EditSpeech(vocab_size=VOCAB, hp=hp, out_dims=80)
        b = first_batch
        init = jax.jit(model.init, static_argnames=("infer",))(
            jax.random.PRNGKey(0), jnp.asarray(b["txt_tokens"]),
            jnp.asarray(b["time_mel_masks"][:, :, None]),
            jnp.asarray(b["mel2ph"]), None, jnp.asarray(b["mels"]),
            None, None, infer=True)["params"]
        return model, merge_params(init, convert_editspeech(sd, hp))
    raise SystemExit(model_name)


def run_edit(model_name: str, ref, model, params, hp, batch, rs):
    """One region edit through BOTH frameworks; returns the two composited
    mels [T, 80] (gt outside the mask, regenerated inside) plus the
    conditioner max-err where applicable."""
    import torch

    import jax.numpy as jnp

    tt = {k: torch.tensor(v) for k, v in batch.items()}
    tmm_t = tt["time_mel_masks"][:, :, None]
    tmm = batch["time_mel_masks"][:, :, None]
    gt = batch["mels"][0]
    m = tmm[0]
    cond_err = 0.0

    if model_name in ("spec_denoiser", "stutter_speech"):
        use_pred_pitch = model_name == "spec_denoiser"
        with torch.no_grad():
            ret_ref = ref.fs(tt["txt_tokens"], tmm_t, tt["mel2ph"], None,
                             tt["f0"], tt["uv"], skip_decoder=True,
                             infer=True, use_pred_pitch=use_pred_pitch)
            nonpad = (tt["mel2ph"] > 0).float()[:, :, None]
            cond_ref = ret_ref["decoder_inp"] + ref.mel_encoder(
                tt["mels"] * (1 - tmm_t)) * nonpad

        if model_name == "spec_denoiser":
            ret = model.apply(
                {"params": params}, jnp.asarray(batch["txt_tokens"]),
                jnp.asarray(tmm), jnp.asarray(batch["mel2ph"]), None,
                jnp.asarray(batch["mels"]), jnp.asarray(batch["f0"]),
                jnp.asarray(batch["uv"]), use_pred_pitch=True,
                method=model.compute_cond)
        else:
            ret = model.apply(
                {"params": params}, jnp.asarray(batch["txt_tokens"]),
                jnp.asarray(tmm), jnp.asarray(batch["stutter_mel_masks"]),
                jnp.asarray(batch["mel2ph"]), None,
                jnp.asarray(batch["mels"]), jnp.asarray(batch["f0"]),
                jnp.asarray(batch["uv"]), infer=True,
                method=model.compute_cond)
        cond_err = float(np.abs(np.asarray(ret["cond"])
                                - cond_ref.numpy()).max())

        t_len = batch["mels"].shape[1]
        noises = [rs.randn(1, 1, 80, t_len).astype(np.float32)
                  for _ in range(hp["timesteps"] + 1)]
        mel_ref = reverse_loop_torch(ref, cond_ref, (1, 1, 80, t_len), noises)
        from speech_editing_tpu.ops.diffusion import DiffusionSchedule

        sched = DiffusionSchedule.create(hp["schedule_type"],
                                         hp["timesteps"], hp["timescale"])
        mel_ours = reverse_loop_flax(model, params, ret["cond"], sched, noises)
        comp_ref = mel_ref[0] * m + gt * (1 - m)
        comp_ours = mel_ours[0] * m + gt * (1 - m)
        return comp_ours, comp_ref, cond_err

    if model_name == "campnet":
        with torch.no_grad():
            out_ref = ref(tt["txt_tokens"], mels=tt["mels"],
                          time_mel_masks=tmm_t)
        out = model.apply({"params": params},
                          jnp.asarray(batch["txt_tokens"]),
                          jnp.asarray(batch["mels"]), jnp.asarray(tmm))
        # mel_out_fine is already gt-composited outside the mask
        return (np.asarray(out["mel_out_fine"])[0],
                out_ref["mel_out_fine"].numpy()[0], cond_err)

    if model_name == "a3t":
        with torch.no_grad():
            out_ref = ref(tt["txt_tokens"], tt["mel2ph"], mels=tt["mels"],
                          time_mel_masks=tmm_t)
        out = model.apply({"params": params},
                          jnp.asarray(batch["txt_tokens"]),
                          jnp.asarray(batch["mels"]),
                          jnp.asarray(batch["mel2ph"]), jnp.asarray(tmm))
        return (np.asarray(out["mel_out_postnet"])[0],
                out_ref["mel_out_postnet"].numpy()[0], cond_err)

    if model_name == "editspeech":
        from speech_editing_tpu.models.editspeech import bidirectional_fusion

        with torch.no_grad():
            out_ref = ref(tt["txt_tokens"], tmm_t, tt["mel2ph"], None,
                          ref_mels=tt["mels"], infer=True)
        out = model.apply({"params": params},
                          jnp.asarray(batch["txt_tokens"]), jnp.asarray(tmm),
                          jnp.asarray(batch["mel2ph"]), None,
                          jnp.asarray(batch["mels"]), None, None, infer=True)

        def fuse(fwd, bwd):
            # the reference task splices at its (degenerate) scalar-argmin
            # fusion point (tasks/speech_editing/editspeech.py:48-55) —
            # apply the identical rule to both frameworks
            return np.asarray(bidirectional_fusion(
                jnp.asarray(fwd), jnp.asarray(bwd),
                jnp.asarray(batch["mels"]), jnp.asarray(tmm),
                degenerate=True))[0]

        comp_ref = fuse(out_ref["forward_outputs"].numpy(),
                        out_ref["backward_outputs"].numpy())
        comp_ours = fuse(np.asarray(out["forward_outputs"]),
                         np.asarray(out["backward_outputs"]))
        return comp_ours, comp_ref, cond_err
    raise SystemExit(model_name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="spec_denoiser",
                    choices=sorted(FAMILY_HP))
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    model_name = args.model
    workdir = args.workdir or f"/tmp/parity_vs_reference_{model_name}"
    out_path = args.out or f"/tmp/parity_vs_reference_{model_name}.json"

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from speech_editing_tpu.utils.os_utils import cpu_keyed_cache_dir

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          cpu_keyed_cache_dir("/tmp/jax_compile_cache"))

    hp = family_hp(model_name)
    HP.clear()
    HP.update(hp)  # reverse_loop_torch reads HP["timesteps"]
    ref = build_reference(model_name, hp)

    os.makedirs(workdir, exist_ok=True)
    data_dir = os.path.join(workdir, "binary")
    if not os.path.exists(f"{data_dir}/train.idx"):
        from e2e_acceptance import write_structured_corpus

        write_structured_corpus(data_dir)
    corpus = load_corpus(data_dir)

    print(f"| training reference torch {model_name} "
          f"({args.steps} steps, CPU)")
    train_reference(model_name, ref, corpus["train"], args.steps)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from speech_editing_tpu.evals.mcd import get_metrics_mels

    first_batch = collate([corpus["test"][0]], np.random.RandomState(0),
                          "infer")
    model, params = convert_and_build(model_name, hp, sd, first_batch)

    rs = np.random.RandomState(1234)
    rows = []
    fw_pairs = []
    for idx, it in enumerate(corpus["test"]):
        batch = collate([it], rs, "infer")
        comp_ours, comp_ref, cond_err = run_edit(
            model_name, ref, model, params, hp, batch, rs)
        gt = batch["mels"][0]
        m = batch["time_mel_masks"][0][:, None]
        fw_pairs.append((comp_ours, comp_ref, gt, m[:, 0]))
        sel = m[:, 0] > 0
        mcd_fw = get_metrics_mels(comp_ours[sel], comp_ref[sel])[0]
        mcd_ref_gt = get_metrics_mels(comp_ref[sel], gt[sel])[0]
        mcd_ours_gt = get_metrics_mels(comp_ours[sel], gt[sel])[0]
        rows.append({"item": it["item_name"], "cond_maxerr": cond_err,
                     "mcd_frameworks": mcd_fw, "mcd_ref_vs_gt": mcd_ref_gt,
                     "mcd_ours_vs_gt": mcd_ours_gt})
        print(f"  {it['item_name']}: cond_err={cond_err:.2e} "
              f"MCD(ours,ref)={mcd_fw:.4f} dB  "
              f"MCD(ref,gt)={mcd_ref_gt:.3f}  MCD(ours,gt)={mcd_ours_gt:.3f}",
              flush=True)

    mcd_fw = float(np.mean([r["mcd_frameworks"] for r in rows]))
    mcd_ref = float(np.mean([r["mcd_ref_vs_gt"] for r in rows]))
    mcd_ours = float(np.mean([r["mcd_ours_vs_gt"] for r in rows]))
    print("| wav-domain metric triple (shared Griffin-Lim vocoder)")
    wav_triple = wav_metric_triple(fw_pairs, workdir)
    report = {
        "model": model_name,
        "protocol": "converted-ckpt, same region edits"
                    + (", same reverse noise"
                       if model_name in ("spec_denoiser", "stutter_speech")
                       else " (deterministic inference)"),
        "train_steps": args.steps, "n_edits": len(rows),
        "mcd_between_frameworks_db": mcd_fw,
        "mcd_ref_vs_gt_db": mcd_ref,
        "mcd_ours_vs_gt_db": mcd_ours,
        "mcd_delta_db": abs(mcd_ours - mcd_ref),
        "target_delta_db": 0.5,
        "pass": abs(mcd_ours - mcd_ref) <= 0.5,
        "wav_metric_triple": wav_triple,
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "rows"},
                     indent=1))
    print(f"\n| [{model_name}] masked-region MCD vs gt: reference "
          f"{mcd_ref:.3f} dB, ours {mcd_ours:.3f} dB, delta "
          f"{abs(mcd_ours - mcd_ref):.3f} dB (target <= 0.5); "
          f"framework-vs-framework MCD {mcd_fw:.4f} dB")
    print("\n| metric | reference (torch) | ours (flax/TPU) |")
    print("|---|---|---|")
    for k in ("mcd", "stoi", "pesq"):
        print(f"| {k.upper()} | {wav_triple['reference'][k]:.4f} "
              f"| {wav_triple['ours'][k]:.4f} |")


if __name__ == "__main__":
    main()
