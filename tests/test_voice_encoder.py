"""flax VoiceEncoder vs a torch replica of resemblyzer's architecture."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_ve():
    import torch.nn as tnn

    class TorchVE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = tnn.LSTM(40, 256, 3, batch_first=True)
            self.linear = tnn.Linear(256, 256)

        def forward(self, mels):
            _, (hidden, _) = self.lstm(mels)
            raw = torch.relu(self.linear(hidden[-1]))
            return raw / (torch.norm(raw, dim=1, keepdim=True) + 1e-8)

    return TorchVE()


def test_forward_parity_with_torch():
    from speech_editing_tpu.models.voice_encoder import (
        VoiceEncoder, convert_resemblyzer_state)

    tm = _torch_ve().eval()
    rs = np.random.RandomState(0)
    mels = rs.randn(3, 160, 40).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = tm(torch.from_numpy(mels)).numpy()

    variables = convert_resemblyzer_state(tm.state_dict())
    out = np.asarray(VoiceEncoder().apply(variables, mels))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_embed_utterance_contract():
    from speech_editing_tpu.models.voice_encoder import VoiceEncoderCtx

    ctx = VoiceEncoderCtx(seed=0)
    sr = 22050
    t = np.arange(sr * 2) / sr

    def voice(f0):
        return (0.3 * np.sin(2 * np.pi * f0 * t)
                + 0.1 * np.sin(2 * np.pi * 2 * f0 * t)).astype(np.float32)

    e1 = ctx.embed_utterance(voice(120))
    e2 = ctx.embed_utterance(voice(120))
    e3 = ctx.embed_utterance(voice(260))
    assert e1.shape == (256,)
    assert abs(np.linalg.norm(e1) - 1.0) < 1e-5
    np.testing.assert_allclose(e1, e2)          # deterministic
    assert not np.allclose(e1, e3, atol=1e-3)   # speaker-discriminative


def test_partial_slices():
    from speech_editing_tpu.models.voice_encoder import (
        VE_PARTIAL_FRAMES, compute_partial_slices)

    # short utterance -> one (possibly padded) partial
    slices = compute_partial_slices(100)
    assert len(slices) >= 1 and slices[0][0] == 0
    # long utterance -> overlapping coverage to the end
    slices = compute_partial_slices(1000)
    assert slices[0][1] - slices[0][0] == VE_PARTIAL_FRAMES
    assert slices[-1][1] >= 1000 - VE_PARTIAL_FRAMES
    starts = [s for s, _ in slices]
    assert starts == sorted(starts)
