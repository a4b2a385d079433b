"""Data-parallel SERVING on the virtual 8-device CPU mesh: the batched
inference program (reverse diffusion + composite + vocode — the same
per-row-keyed program ``infer/serving.py`` runs) sharded over the mesh's
batch axis must produce per-row outputs equal to the single-device
program (VERDICT r4 next#5 — training was multi-chip-proven, inference
was not). ``__graft_entry__.dryrun_multichip`` runs the same phase."""

import numpy as np
import pytest

from tests.helpers import TINY_HP, VOCAB, synth_batch


@pytest.fixture(scope="module")
def jax():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax


def test_dp_serving_matches_single_device(jax):
    import jax.numpy as jnp

    from speech_editing_tpu.models.vocoder import HifiGanGenerator
    from speech_editing_tpu.parallel.mesh import (make_mesh, replicate_tree,
                                                  shard_batch)
    from speech_editing_tpu.training.tasks.spec_denoiser import build_model

    hp = dict(TINY_HP, use_spk_embed=False)
    model = build_model(VOCAB, hp)
    voc = HifiGanGenerator(hp={
        "upsample_rates": [4, 4], "upsample_kernel_sizes": [8, 8],
        "upsample_initial_channel": 8, "resblock": "2",
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]]})

    rs = np.random.RandomState(0)
    # synth_batch shrinks row b's frame count by 8*b — T must stay >= S+1
    # frames at the LAST row (T=96: row 7 keeps 40 frames for 1 token)
    b, t, s = 8, 96, 8
    batch = synth_batch(rs, B=b, S=s, T=t)
    tm = batch["time_mel_masks"][..., None].astype(np.float32)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        jnp.asarray(batch["txt_tokens"]), jnp.asarray(tm),
        jnp.asarray(batch["mel2ph"]), None, jnp.asarray(batch["mels"]),
        jnp.asarray(batch["f0"]), jnp.asarray(batch["uv"]))
    vparams = jax.jit(voc.init)(jax.random.PRNGKey(2),
                                jnp.asarray(batch["mels"]))
    # per-REQUEST keys, as the serving engine stacks them
    row_keys = np.stack([np.asarray(
        jax.random.fold_in(jax.random.PRNGKey(7), i)) for i in range(b)])

    def serve_fn(params, vps, txt, tmask, m2p, ref, f0, uv, keys):
        out = model.apply(params, txt, tmask, m2p, None, ref, f0, uv,
                          infer=True, use_pred_pitch=True, rng=keys)
        comp = out["mel_out"] * tmask + ref * (1 - tmask)
        return comp, voc.apply(vps, comp)

    args = (batch["txt_tokens"], tm, batch["mel2ph"], batch["mels"],
            batch["f0"], batch["uv"], row_keys)
    mel_1, wav_1 = jax.jit(serve_fn)(
        variables, vparams, *(jnp.asarray(a) for a in args))

    mesh = make_mesh(8)
    sharded = shard_batch({i: a for i, a in enumerate(args)}, mesh)
    mel_8, wav_8 = jax.jit(serve_fn)(
        replicate_tree(variables, mesh), replicate_tree(vparams, mesh),
        *(sharded[i] for i in range(len(args))))
    # every leaf really is batch-sharded (one row per device)
    assert sharded[3].sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(mel_8), np.asarray(mel_1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(wav_8), np.asarray(wav_1),
                               atol=1e-5)
