"""Torch->flax HiFi-GAN conversion: activation-level parity with the
reference torch generator (random weights, same mel in, same wav out)."""

import sys

import numpy as np
import pytest

REF = "/root/reference"

VHP = {
    "upsample_rates": [4, 4, 2],
    "upsample_kernel_sizes": [8, 8, 4],
    "upsample_initial_channel": 64,
    "resblock": "1",
    "resblock_kernel_sizes": [3, 7],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
}


@pytest.mark.parametrize("resblock", ["1", "2"])
def test_hifigan_torch_to_flax_parity(resblock):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        from modules.vocoder.hifigan.hifigan import \
            HifiGanGenerator as RefGen  # type: ignore
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)

    import jax
    import jax.numpy as jnp

    from speech_editing_tpu.models.vocoder import HifiGanGenerator
    from speech_editing_tpu.utils.convert_torch_ckpt import \
        convert_hifigan_generator

    hp = dict(VHP, resblock=resblock)
    if resblock == "2":
        hp["resblock_dilation_sizes"] = [[1, 3], [1, 3]]
    torch.manual_seed(0)
    ref = RefGen(hp)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_hifigan_generator(sd, hp)

    rs = np.random.RandomState(0)
    mel = rs.randn(1, 32, 80).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_wav = ref(torch.tensor(mel).transpose(1, 2)).numpy()[0, 0]

    gen = HifiGanGenerator(hp=hp)
    # structural check: converted tree matches a fresh init's tree
    init = gen.init(jax.random.PRNGKey(0), jnp.asarray(mel))["params"]
    flat_i = {jax.tree_util.keystr(p): v.shape for p, v in
              jax.tree_util.tree_leaves_with_path(init)}
    flat_c = {jax.tree_util.keystr(p): np.shape(v) for p, v in
              jax.tree_util.tree_leaves_with_path(params)}
    assert flat_i == flat_c, set(flat_i.items()) ^ set(flat_c.items())

    wav = np.asarray(gen.apply({"params": params}, jnp.asarray(mel)))[0]
    assert wav.shape == ref_wav.shape
    err = np.abs(wav - ref_wav).max()
    assert err < 2e-3, f"activation mismatch: max abs err {err}"


def test_diffnet_torch_to_flax_parity():
    """The flagship denoiser matches the reference torch DiffNet
    activation-for-activation with converted weights."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        import utils.commons.hparams as ref_hparams  # type: ignore

        ref_hparams.hparams.update(hidden_size=64, residual_layers=4,
                                   residual_channels=64,
                                   dilation_cycle_length=1)
        from modules.speech_editing.spec_denoiser.diffnet import \
            DiffNet as RefDiffNet  # type: ignore
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)

    import jax.numpy as jnp

    from speech_editing_tpu.modules.wavenet import DiffNet
    from speech_editing_tpu.utils.convert_torch_ckpt import convert_diffnet

    torch.manual_seed(0)
    ref = RefDiffNet(in_dims=80)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_diffnet(sd, residual_layers=4)

    rs = np.random.RandomState(0)
    b, t = 2, 24
    x = rs.randn(b, t, 80).astype(np.float32) * 0.5       # ours: [B, T, M]
    cond = rs.randn(b, t, 64).astype(np.float32)          # ours: [B, T, H]
    steps = np.array([3, 7], np.int64)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 2, 1))[:, None],  # [B,1,M,T]
                      torch.tensor(steps),
                      torch.tensor(cond.transpose(0, 2, 1)))        # [B,H,T]
    ref_out = ref_out.numpy()[:, 0].transpose(0, 2, 1)              # [B,T,M]

    net = DiffNet(in_dims=80, encoder_hidden=64, residual_layers=4,
                  residual_channels=64, dilation_cycle_length=1)
    out = np.asarray(net.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(steps), jnp.asarray(cond)))
    assert out.shape == ref_out.shape
    err = np.abs(out - ref_out).max()
    assert err < 2e-3, f"DiffNet activation mismatch: {err}"


SD_HP = {
    # small FluentSpeech config with the reference's structure (fft/fft,
    # pitch + spk-embed conditioning) — egs/spec_denoiser.yaml shape at
    # test size
    "hidden_size": 64, "enc_layers": 2, "dec_layers": 2,
    "enc_ffn_kernel_size": 9, "dec_ffn_kernel_size": 9, "num_heads": 2,
    "encoder_type": "fft", "decoder_type": "fft",
    "audio_num_mel_bins": 80, "use_spk_id": False, "use_spk_embed": True,
    "predictor_hidden": -1, "dur_predictor_layers": 2,
    "dur_predictor_kernel": 3, "predictor_dropout": 0.5,
    "use_pitch_embed": True, "predictor_kernel": 5,
    "dec_inp_add_noise": False, "predictor_grad": 0.1,
    "pitch_type": "frame", "use_uv": True, "frames_multiple": 1,
    "residual_layers": 4, "residual_channels": 32,
    "dilation_cycle_length": 1, "keep_bins": 80,
    "schedule_type": "vpsde", "timesteps": 8, "timescale": 1,
    "diff_loss_type": "l1", "use_masked_cond": True,
    # these goldens are computed on PADDED torch batches; reproduce the
    # reference's padded-input semantics (unmasked predictor convs etc.) —
    # the default-mode divergence at padding is asserted by the
    # bucket-inertness tests in tests/test_serving.py
    "ref_pad_compat": True,
}


def _spec_denoiser_inputs(rs, b=2, s=12, t=32, vocab=20):
    """Random but structurally valid batch for both frameworks."""
    tokens = rs.randint(1, vocab, (b, s)).astype(np.int64)
    tokens[0, 10:] = 0
    tokens[1, 8:] = 0
    mel2ph = np.zeros((b, t), np.int64)
    for bi, n_tok in enumerate([10, 8]):
        # monotone frame->token map over the valid tokens, tail padded
        n_frames = t - 4 * bi
        bounds = np.sort(rs.choice(np.arange(1, n_frames), n_tok - 1,
                                   replace=False))
        mel2ph[bi, :n_frames] = np.searchsorted(
            bounds, np.arange(n_frames), side="right") + 1
    f0 = (rs.rand(b, t).astype(np.float32) * 2 + 6.5)  # log2-ish range
    uv = (rs.rand(b, t) < 0.2).astype(np.float32)
    f0 = f0 * (1 - uv)
    tmm = (rs.rand(b, t) < 0.4).astype(np.float32)[:, :, None]
    spk = rs.randn(b, 256).astype(np.float32)
    mels = (rs.randn(b, t, 80).astype(np.float32) * 0.5 - 1.0)
    return tokens, mel2ph, f0, uv, tmm, spk, mels


def test_full_spec_denoiser_torch_to_flax_parity():
    """Whole-model FluentSpeech parity: the converted checkpoint reproduces
    the reference GaussianDiffusion forward (conditioner durations, pitch,
    the full cond tensor, and the denoiser x0 prediction) activation-for-
    activation. This is the converter that loads the released 568k
    checkpoint (reference README.md:89)."""
    torch = pytest.importorskip("torch")
    from tests.helpers import stub_reference_deps
    stub_reference_deps()
    sys.path.insert(0, REF)
    try:
        import utils.commons.hparams as ref_hparams  # type: ignore

        ref_hparams.hparams.update(SD_HP)
        from modules.speech_editing.spec_denoiser.diffnet import \
            DiffNet as RefDiffNet  # type: ignore
        from modules.speech_editing.spec_denoiser.spec_denoiser import \
            GaussianDiffusion as RefGD  # type: ignore
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)

    import jax
    import jax.numpy as jnp

    from speech_editing_tpu.models.spec_denoiser.spec_denoiser import \
        GaussianDiffusion
    from speech_editing_tpu.utils.convert_torch_ckpt import \
        convert_gaussian_diffusion

    vocab = 20
    torch.manual_seed(0)
    spec_minmax = dict(spec_min=[-6.0] * 80, spec_max=[1.0] * 80)
    ref = RefGD(phone_encoder=list(range(vocab)), out_dims=80,
                denoise_fn=RefDiffNet(80),
                timesteps=SD_HP["timesteps"], time_scale=SD_HP["timescale"],
                loss_type=SD_HP["diff_loss_type"], **spec_minmax)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_gaussian_diffusion(sd, SD_HP)

    rs = np.random.RandomState(0)
    tokens, mel2ph, f0, uv, tmm, spk, mels = _spec_denoiser_inputs(
        rs, vocab=vocab)
    t_step = np.array([3, 7], np.int64)
    noise = rs.randn(2, 1, 80, mels.shape[1]).astype(np.float32)  # torch NCHW

    with torch.no_grad():
        tt = torch.tensor
        ret_ref = ref.fs(tt(tokens), tt(tmm), tt(mel2ph), tt(spk), tt(f0),
                         tt(uv), skip_decoder=True, infer=False)
        tgt_nonpad = (tt(mel2ph) > 0).float()[:, :, None]
        cond_ref = ret_ref["decoder_inp"] + ref.mel_encoder(
            tt(mels) * (1 - tt(tmm))) * tgt_nonpad
        nonpad_nchw = (tt(mel2ph) != 0).float()[:, None, None, :]
        x_t_ref = ref.diffuse_fn(tt(mels), tt(t_step.copy()),
                                 tt(noise)) * nonpad_nchw
        x0_ref = ref.denoise_fn(x_t_ref, tt(t_step),
                                cond_ref.transpose(1, 2)) * nonpad_nchw
        x0_ref = x0_ref.numpy()[:, 0].transpose(0, 2, 1)  # [B, T, 80]

    model = GaussianDiffusion(vocab_size=vocab, hp=SD_HP, out_dims=80)
    init = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(tmm),
        jnp.asarray(mel2ph), jnp.asarray(spk), jnp.asarray(mels),
        jnp.asarray(f0), jnp.asarray(uv),
        rng=jax.random.PRNGKey(1))["params"]
    flat_i = {jax.tree_util.keystr(p): v.shape for p, v in
              jax.tree_util.tree_leaves_with_path(init)}
    flat_c = {jax.tree_util.keystr(p): np.shape(v) for p, v in
              jax.tree_util.tree_leaves_with_path(params)}
    assert flat_i == flat_c, set(flat_i.items()) ^ set(flat_c.items())

    ret = model.apply({"params": params}, jnp.asarray(tokens),
                      jnp.asarray(tmm), jnp.asarray(mel2ph), jnp.asarray(spk),
                      jnp.asarray(mels), jnp.asarray(f0), jnp.asarray(uv),
                      method=model.compute_cond)
    x_t_ours = jnp.asarray(x_t_ref.numpy()[:, 0].transpose(0, 2, 1))
    x0_ours = model.apply({"params": params}, x_t_ours,
                          jnp.asarray(t_step), ret["cond"],
                          method=model.denoise)
    nonpad = (mel2ph != 0)[:, :, None]
    x0_ours = np.asarray(x0_ours) * nonpad

    err_dur = np.abs(np.asarray(ret["dur"]) -
                     ret_ref["dur"].numpy()).max()
    err_pitch = np.abs(np.asarray(ret["pitch_pred"]) -
                       ret_ref["pitch_pred"].numpy()).max()
    err_cond = np.abs(np.asarray(ret["cond"]) - cond_ref.numpy()).max()
    err_x0 = np.abs(x0_ours - x0_ref).max()
    assert err_dur < 5e-3, f"dur mismatch: {err_dur}"
    assert err_pitch < 5e-3, f"pitch mismatch: {err_pitch}"
    assert err_cond < 5e-3, f"cond mismatch: {err_cond}"
    assert err_x0 < 1e-2, f"x0 prediction mismatch: {err_x0}"


def test_mel_encoder_and_predictors_parity():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        from modules.speech_editing.commons.mel_encoder import \
            MelEncoder as RefMelEnc  # type: ignore
        from modules.commons.nar_tts_modules import (  # type: ignore
            DurationPredictor as RefDur, PitchPredictor as RefPitch)
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)

    import jax.numpy as jnp

    from speech_editing_tpu.modules.predictors import (DurationPredictor,
                                                       MelEncoder,
                                                       PitchPredictor)
    from speech_editing_tpu.utils.convert_torch_ckpt import (
        convert_mel_encoder, convert_predictor)

    rs = np.random.RandomState(0)
    torch.manual_seed(0)

    # MelEncoder
    ref = RefMelEnc(input_dim=80, hidden_size=48).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mel = rs.randn(2, 20, 80).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(mel)).numpy()
    ours = np.asarray(MelEncoder(hidden_size=48).apply(
        {"params": convert_mel_encoder(sd)}, jnp.asarray(mel)))
    assert np.abs(ours - ref_out).max() < 2e-3

    # DurationPredictor (eval mode -> dropout off)
    ref_d = RefDur(idim=48, n_layers=3, n_chans=48, kernel_size=3).eval()
    sd = {k: v.detach().numpy() for k, v in ref_d.state_dict().items()}
    x = rs.randn(2, 20, 48).astype(np.float32)
    pad = np.zeros((2, 20), bool)
    pad[1, 15:] = True
    with torch.no_grad():
        ref_out = ref_d(torch.tensor(x), torch.tensor(pad)).numpy()
    ours = np.asarray(DurationPredictor(
        n_chans=48, n_layers=3, kernel_size=3, dropout_rate=0.1).apply(
        {"params": convert_predictor(sd, 3)}, jnp.asarray(x), jnp.asarray(pad)))
    # TPU bf16 matmuls + LayerNorm eps mismatch: ~0.5% relative
    assert np.abs(ours - ref_out).max() < 1e-2

    # PitchPredictor
    ref_p = RefPitch(idim=48, n_layers=2, n_chans=48, odim=2,
                     kernel_size=5).eval()
    sd = {k: v.detach().numpy() for k, v in ref_p.state_dict().items()}
    with torch.no_grad():
        ref_out = ref_p(torch.tensor(x)).numpy()
    ours = np.asarray(PitchPredictor(
        n_chans=48, n_layers=2, odim=2, kernel_size=5,
        dropout_rate=0.1).apply(
        {"params": convert_predictor(sd, 2)}, jnp.asarray(x)))
    assert np.abs(ours - ref_out).max() < 1e-2
