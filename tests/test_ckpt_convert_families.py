"""Torch->flax conversion parity for the OTHER four editing families
(VERDICT r2 #2): CampNet, EditSpeech, A3T, StutterSpeech. Each test builds
the reference torch model (imported from /root/reference, never copied),
random-initialises it, converts the state_dict, and asserts the flax model
reproduces the forward activations (< 5e-3), the same bar the FluentSpeech
converter already passes in test_ckpt_convert.py."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def _import_ref(hp):
    torch = pytest.importorskip("torch")
    from tests.helpers import stub_reference_deps

    stub_reference_deps()
    sys.path.insert(0, REF)
    import utils.commons.hparams as ref_hparams  # type: ignore

    ref_hparams.hparams.update(hp)
    return torch


BASE_HP = {
    "hidden_size": 32, "enc_layers": 2, "dec_layers": 2,
    "enc_ffn_kernel_size": 5, "dec_ffn_kernel_size": 9, "num_heads": 2,
    "encoder_type": "fft", "decoder_type": "fft",
    "audio_num_mel_bins": 80, "use_spk_id": False, "use_spk_embed": False,
    "num_spk": 1, "predictor_hidden": -1, "dur_predictor_layers": 2,
    "dur_predictor_kernel": 3, "predictor_dropout": 0.0,
    "use_pitch_embed": False, "predictor_kernel": 5,
    "dec_inp_add_noise": False, "predictor_grad": 0.1,
    "pitch_type": "frame", "use_uv": True, "frames_multiple": 1,
    "enc_dilations": [1, 1], "enc_kernel_size": 5, "layers_in_block": 2,
    "enc_dec_norm": "ln", "enc_post_net_kernel": 3,
    "dropout": 0.0,
    # goldens below are computed on PADDED torch batches; reproduce the
    # reference's padded-input semantics (value-only attention masking,
    # full-axis backward LSTM flip, unmasked predictor convs) — default-mode
    # divergence at padding is asserted by tests/test_serving.py
    "ref_pad_compat": True,
}


def _inputs(rs, vocab=20, b=2, t=40, s=8):
    tokens = rs.randint(3, vocab, (b, s)).astype(np.int64)
    tokens[1, -2:] = 0  # txt padding
    mel2ph = np.zeros((b, t), np.int64)
    for i in range(b):
        t_val = t - 6 * i
        bounds = np.sort(rs.choice(np.arange(1, t_val), s - 2 - i,
                                   replace=False))
        bounds = np.concatenate([[0], bounds, [t_val]])
        mel2ph[i, :t_val] = np.searchsorted(
            bounds, np.arange(t_val), side="right")
    mels = (rs.randn(b, t, 80).astype(np.float32) * 0.5 - 1.0)
    mels[mel2ph == 0] = 0.0
    tmm = np.zeros((b, t), np.float32)
    tmm[:, 10:22] = 1.0
    tmm[mel2ph == 0] = 0.0
    return tokens, mel2ph, mels, tmm[:, :, None]


def test_campnet_torch_to_flax_parity():
    hp = dict(BASE_HP, use_spk_embed=True)  # ctor del needs the attr built
    torch = _import_ref(hp)
    try:
        from modules.speech_editing.campnet.campnet import \
            CampNet as RefCampNet  # type: ignore
    finally:
        sys.path.remove(REF)

    import jax
    import jax.numpy as jnp

    from speech_editing_tpu.models.campnet import CampNet
    from speech_editing_tpu.utils.convert_torch_ckpt import convert_campnet

    vocab = 20
    torch.manual_seed(0)
    ref = RefCampNet(vocab, vocab, hp)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_campnet(sd, hp)

    rs = np.random.RandomState(0)
    tokens, mel2ph, mels, tmm = _inputs(rs, vocab=vocab)
    with torch.no_grad():
        tt = torch.tensor
        ret_ref = ref(tt(tokens), mels=tt(mels), time_mel_masks=tt(tmm))

    model = CampNet(vocab_size=vocab, hp=hp, out_dims=80)
    init = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(tokens),
                               jnp.asarray(mels), jnp.asarray(tmm))["params"]
    flat_i = {jax.tree_util.keystr(p): v.shape for p, v in
              jax.tree_util.tree_leaves_with_path(init)}
    flat_c = {jax.tree_util.keystr(p): np.shape(v) for p, v in
              jax.tree_util.tree_leaves_with_path(params)}
    assert flat_i == flat_c, set(flat_i.items()) ^ set(flat_c.items())

    ret = model.apply({"params": params}, jnp.asarray(tokens),
                      jnp.asarray(mels), jnp.asarray(tmm))
    for key in ("mel_out_coarse", "mel_out_fine"):
        err = np.abs(np.asarray(ret[key]) - ret_ref[key].numpy()).max()
        assert err < 5e-3, f"{key} mismatch: {err}"
    err_attn = np.abs(np.asarray(ret["attn"])
                      - ret_ref["attn"].numpy()).max()
    assert err_attn < 5e-3, f"attn mismatch: {err_attn}"


def test_editspeech_torch_to_flax_parity():
    hp = dict(BASE_HP, encoder_type="conv", lstm_hidden=64)
    torch = _import_ref(hp)
    try:
        from modules.speech_editing.editspeech.editspeech import \
            EditSpeech as RefEditSpeech  # type: ignore
    finally:
        sys.path.remove(REF)

    import jax
    import jax.numpy as jnp

    from speech_editing_tpu.models.editspeech import EditSpeech
    from speech_editing_tpu.utils.convert_torch_ckpt import (
        convert_editspeech, merge_params)

    vocab = 20
    torch.manual_seed(0)
    ref = RefEditSpeech(list(range(vocab)), 80)
    # the reference hardcodes LSTM hidden 1024 (editspeech.py:25-27);
    # shrink it for the test by rebuilding the decoder at 64
    from modules.speech_editing.editspeech.lstm import \
        LSTM_Seq2Seq  # type: ignore

    ref.decoder = LSTM_Seq2Seq(prenet_hidden_size=hp["hidden_size"],
                               hidden_size=64, output_dim=80)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rs = np.random.RandomState(0)
    tokens, mel2ph, mels, tmm = _inputs(rs, vocab=vocab)
    with torch.no_grad():
        tt = torch.tensor
        ret_ref = ref(tt(tokens), tt(tmm), tt(mel2ph), None,
                      ref_mels=tt(mels), infer=True)

    model = EditSpeech(vocab_size=vocab, hp=hp, out_dims=80)
    init = jax.jit(model.init, static_argnames=("infer",))(
        jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(tmm),
        jnp.asarray(mel2ph), None, jnp.asarray(mels), None, None,
        infer=True)["params"]
    params = merge_params(init, convert_editspeech(sd, hp))

    ret = model.apply({"params": params}, jnp.asarray(tokens),
                      jnp.asarray(tmm), jnp.asarray(mel2ph), None,
                      jnp.asarray(mels), None, None, infer=True)
    for key in ("forward_outputs", "backward_outputs"):
        err = np.abs(np.asarray(ret[key]) - ret_ref[key].numpy()).max()
        assert err < 5e-3, f"{key} mismatch: {err}"
    err_dur = np.abs(np.asarray(ret["dur"]) - ret_ref["dur"].numpy()).max()
    assert err_dur < 5e-3, f"dur mismatch: {err_dur}"


def test_a3t_torch_to_flax_parity():
    hp = dict(BASE_HP)
    torch = _import_ref(hp)
    try:
        from modules.speech_editing.a3t.a3t import A3T as RefA3T  # type: ignore
    finally:
        sys.path.remove(REF)

    import jax
    import jax.numpy as jnp

    from speech_editing_tpu.models.a3t import A3T
    from speech_editing_tpu.utils.convert_torch_ckpt import convert_a3t

    vocab = 20
    torch.manual_seed(0)
    ref = RefA3T(vocab, vocab, hp)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_a3t(sd, hp)

    rs = np.random.RandomState(0)
    tokens, mel2ph, mels, tmm = _inputs(rs, vocab=vocab)
    with torch.no_grad():
        tt = torch.tensor
        ret_ref = ref(tt(tokens), tt(mel2ph), mels=tt(mels),
                      time_mel_masks=tt(tmm))

    hp_flax = dict(hp, espnet_bn_affine=True)  # folded eval-mode BN
    model = A3T(vocab_size=vocab, hp=hp_flax, out_dims=80)
    init = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(tokens),
                               jnp.asarray(mels), jnp.asarray(mel2ph),
                               jnp.asarray(tmm))["params"]
    flat_i = {jax.tree_util.keystr(p): v.shape for p, v in
              jax.tree_util.tree_leaves_with_path(init)}
    flat_c = {jax.tree_util.keystr(p): np.shape(v) for p, v in
              jax.tree_util.tree_leaves_with_path(params)}
    assert flat_i == flat_c, set(flat_i.items()) ^ set(flat_c.items())

    ret = model.apply({"params": params}, jnp.asarray(tokens),
                      jnp.asarray(mels), jnp.asarray(mel2ph),
                      jnp.asarray(tmm))
    for key in ("mel_out_decoder", "mel_out_postnet"):
        err = np.abs(np.asarray(ret[key]) - ret_ref[key].numpy()).max()
        assert err < 5e-3, f"{key} mismatch: {err}"


def test_stutter_speech_torch_to_flax_parity():
    hp = dict(BASE_HP, use_pitch_embed=True,
              residual_layers=4, residual_channels=24,
              dilation_cycle_length=1, keep_bins=80,
              schedule_type="vpsde", timesteps=4, timescale=1,
              diff_loss_type="l1")
    torch = _import_ref(hp)
    try:
        from modules.speech_editing.stutter_speech.spec_denoiser import \
            GaussianDiffusion as RefSGD  # type: ignore
        from modules.speech_editing.stutter_speech.diffnet import \
            DiffNet as RefDiffNet  # type: ignore
    finally:
        sys.path.remove(REF)

    import jax
    import jax.numpy as jnp

    from speech_editing_tpu.models.stutter_speech import \
        StutterGaussianDiffusion
    from speech_editing_tpu.utils.convert_torch_ckpt import \
        convert_stutter_gaussian_diffusion

    vocab = 20
    torch.manual_seed(0)
    ref = RefSGD(phone_encoder=list(range(vocab)), out_dims=80,
                 denoise_fn=RefDiffNet(80), timesteps=hp["timesteps"],
                 time_scale=hp["timescale"], loss_type="l1",
                 spec_min=[-6.0] * 80, spec_max=[1.0] * 80)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_stutter_gaussian_diffusion(sd, hp)

    rs = np.random.RandomState(0)
    tokens, mel2ph, mels, tmm = _inputs(rs, vocab=vocab)
    f0 = (rs.rand(*mel2ph.shape).astype(np.float32) * 2 + 6.5)
    uv = (rs.rand(*mel2ph.shape) < 0.2).astype(np.float32)
    f0 = f0 * (1 - uv) * (mel2ph > 0)
    stutter = (rs.rand(*mel2ph.shape) < 0.3).astype(np.int64)
    stutter[mel2ph == 0] = 2
    t_step = np.array([1, 3], np.int64)

    with torch.no_grad():
        tt = torch.tensor
        ret_ref = ref.fs(tt(tokens), tt(tmm), tt(mel2ph), None, tt(f0),
                         tt(uv), skip_decoder=True, infer=False)
        tgt_nonpad = (tt(mel2ph) > 0).float()[:, :, None]
        dec_inp = ret_ref["decoder_inp"]
        stutter_cond = ref.mel_encoder(tt(mels)) * tgt_nonpad
        sp_out_ref = ref.stutter_predictor(dec_inp, cond=stutter_cond,
                                           nonpadding=tgt_nonpad)
        dec_inp = dec_inp + ref.stutter_embed(tt(stutter)) * tgt_nonpad
        cond_ref = dec_inp + ref.mel_encoder(
            tt(mels) * (1 - tt(tmm))) * tgt_nonpad
        nonpad_nchw = (tt(mel2ph) != 0).float()[:, None, None, :]
        noise = rs.randn(2, 1, 80, mels.shape[1]).astype(np.float32)
        x_t_ref = ref.diffuse_fn(tt(mels), tt(t_step.copy()),
                                 tt(noise)) * nonpad_nchw
        x0_ref = ref.denoise_fn(x_t_ref, tt(t_step),
                                cond_ref.transpose(1, 2)) * nonpad_nchw
        x0_ref = x0_ref.numpy()[:, 0].transpose(0, 2, 1)

    model = StutterGaussianDiffusion(vocab_size=vocab, hp=hp, out_dims=80)
    ret = model.apply(
        {"params": params}, jnp.asarray(tokens), jnp.asarray(tmm),
        jnp.asarray(stutter), jnp.asarray(mel2ph), None, jnp.asarray(mels),
        jnp.asarray(f0), jnp.asarray(uv), infer=False,
        method=model.compute_cond)
    err_sp = np.abs(np.asarray(ret["stutter_predictor_out"])
                    - sp_out_ref.numpy()).max()
    err_cond = np.abs(np.asarray(ret["cond"]) - cond_ref.numpy()).max()
    x_t_ours = jnp.asarray(x_t_ref.numpy()[:, 0].transpose(0, 2, 1))
    x0_ours = model.apply({"params": params}, x_t_ours,
                          jnp.asarray(t_step), ret["cond"],
                          method=model.denoise)
    x0_ours = np.asarray(x0_ours) * (mel2ph != 0)[:, :, None]
    err_x0 = np.abs(x0_ours - x0_ref).max()
    assert err_sp < 5e-3, f"stutter predictor mismatch: {err_sp}"
    assert err_cond < 5e-3, f"cond mismatch: {err_cond}"
    assert err_x0 < 1e-2, f"x0 mismatch: {err_x0}"
