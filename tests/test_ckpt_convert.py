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
