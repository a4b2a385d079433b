"""Flash-attention wrapper: gating, mask->segment translation, param parity.

The kernel itself is a Mosaic TPU program: its numerics are verified on
hardware by ``scripts/check_flash.py`` (fwd exact vs the einsum path on
valid rows, grads < 1e-2 abs) and exercised by every TPU bench/train run.
Interpret mode is too slow on this 1-CPU CI host (jit of the interpreted
grid), so the CPU suite covers everything around the kernel instead:

* auto-gating: flash must be OFF on the CPU backend and honor forcing;
* padding-mask -> segment-id translation (the correctness-critical glue);
* the MultiheadAttention module creates an identical param tree on both
  paths, so checkpoints move freely between CPU and TPU hosts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_editing_tpu.ops.flash_attention import (flash_enabled,
                                                    padding_to_segments,
                                                    set_flash_enabled)


def test_flash_disabled_on_cpu_backend():
    assert jax.default_backend() == "cpu"
    assert not flash_enabled()


def test_force_override_roundtrip():
    try:
        set_flash_enabled(True)
        assert flash_enabled()
        set_flash_enabled(False)
        assert not flash_enabled()
    finally:
        set_flash_enabled(None)
    assert not flash_enabled()  # back to auto (cpu)


def test_padding_to_segments_semantics():
    pad = jnp.asarray(np.array([[False, False, True, True],
                                [False, False, False, True]]))
    q_valid, kv_valid = padding_to_segments(pad, b=2, tq=4, tk=4,
                                            tq_p=8, tk_p=8)
    assert q_valid.shape == (2, 8) and kv_valid.shape == (2, 8)
    # every real query row is segment 1; grid tail is 0
    np.testing.assert_array_equal(np.asarray(q_valid),
                                  [[1, 1, 1, 1, 0, 0, 0, 0]] * 2)
    # pad keys and grid tail are excluded (segment 0)
    np.testing.assert_array_equal(np.asarray(kv_valid),
                                  [[1, 1, 0, 0, 0, 0, 0, 0],
                                   [1, 1, 1, 0, 0, 0, 0, 0]])


def test_padding_to_segments_no_mask():
    q_valid, kv_valid = padding_to_segments(None, b=1, tq=3, tk=5,
                                            tq_p=128, tk_p=128)
    assert int(q_valid.sum()) == 3 and int(kv_valid.sum()) == 5


@pytest.mark.parametrize("force", [False, True])
def test_mha_param_tree_identical_across_paths(force):
    """A checkpoint written on a TPU host (flash path traced) must load on
    a CPU host (einsum path) — the param trees have to match exactly."""
    from speech_editing_tpu.modules.transformer import MultiheadAttention

    x = jnp.zeros((2, 16, 32))
    mod = MultiheadAttention(32, 2)
    try:
        set_flash_enabled(force)
        # init under eval_shape traces the active branch only up to
        # parameter creation — the kernel itself never executes on CPU
        variables = jax.eval_shape(
            lambda: mod.init(jax.random.PRNGKey(0), x, x, x))
    finally:
        set_flash_enabled(None)
    flat = jax.tree_util.tree_leaves_with_path(variables)
    names = sorted("/".join(str(p) for p in path) for path, _ in flat)
    assert any("q_proj" in n for n in names)
    assert any("out_proj" in n for n in names)
    # same four projection kernels regardless of path
    projs = {n for n in names if "kernel" in n}
    assert len(projs) == 4, names
