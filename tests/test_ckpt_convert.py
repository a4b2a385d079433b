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
