"""Legacy espnet rel-shift vs its true-length gather emulation
(modules/conformer.py — the A3T pad-safe mechanism).

The probed mapping of the reference's pad/reshape shift is
``y[i,j] = x[i, T-1-(i-j)]`` for ``j<=i``, ``0`` at ``j==i+1``,
``x[i+1, j-i-2]`` for ``j>i+1`` — explicitly T-dependent.
``_true_len_rel_shift`` must (a) equal the reshape trick bit-for-bit at
``true_len == T`` and (b) at ``true_len = L < T`` reproduce, on the
valid [0:L, 0:L] block, the reshape trick applied to the length-L
slice."""

import numpy as np


def test_true_len_shift_matches_legacy_at_full_length():
    import jax.numpy as jnp

    from speech_editing_tpu.modules.conformer import (_legacy_rel_shift,
                                                      _true_len_rel_shift)

    rs = np.random.RandomState(0)
    x = rs.randn(3, 2, 17, 17).astype(np.float32)
    legacy = np.asarray(_legacy_rel_shift(jnp.asarray(x)))
    true_t = np.asarray(_true_len_rel_shift(
        jnp.asarray(x), jnp.full((3,), 17)))
    np.testing.assert_array_equal(legacy, true_t)


def test_true_len_shift_matches_sliced_legacy():
    import jax.numpy as jnp

    from speech_editing_tpu.modules.conformer import (_legacy_rel_shift,
                                                      _true_len_rel_shift)

    rs = np.random.RandomState(1)
    T = 12
    for L in (5, 8, 11):
        x = rs.randn(1, 1, T, T).astype(np.float32)
        # exact fit: run the reference reshape trick on the L-slice
        ref = np.asarray(_legacy_rel_shift(jnp.asarray(x[:, :, :L, :L])))
        got = np.asarray(_true_len_rel_shift(jnp.asarray(x),
                                             jnp.full((1,), L)))
        np.testing.assert_array_equal(got[:, :, :L, :L], ref)


def test_true_len_shift_per_row_lengths():
    """Rows of one batch can carry different true lengths."""
    import jax.numpy as jnp

    from speech_editing_tpu.modules.conformer import (_legacy_rel_shift,
                                                      _true_len_rel_shift)

    rs = np.random.RandomState(2)
    T = 10
    x = rs.randn(2, 1, T, T).astype(np.float32)
    got = np.asarray(_true_len_rel_shift(jnp.asarray(x),
                                         jnp.asarray([4, 9])))
    for b, L in ((0, 4), (1, 9)):
        ref = np.asarray(_legacy_rel_shift(
            jnp.asarray(x[b: b + 1, :, :L, :L])))
        np.testing.assert_array_equal(got[b: b + 1, :, :L, :L], ref)
