import jax.numpy as jnp
import numpy as np

from speech_editing_tpu.ops import seq_ops


def test_length_regulator_matches_naive():
    dur = jnp.array([[2, 2, 3, 0], [1, 0, 2, 4]])
    out = seq_ops.length_regulator(dur, max_frames=10)
    expect = np.zeros((2, 10), np.int32)
    expect[0, :7] = [1, 1, 2, 2, 3, 3, 3]
    expect[1, :7] = [1, 3, 3, 4, 4, 4, 4]
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_length_regulator_padding_and_alpha():
    dur = jnp.array([[2.0, 2.0, 2.0]])
    pad = jnp.array([[0, 0, 1]])
    out = seq_ops.length_regulator(dur, 8, dur_padding=pad, alpha=1.0)
    np.testing.assert_array_equal(np.asarray(out)[0], [1, 1, 2, 2, 0, 0, 0, 0])


def test_dur_roundtrip():
    dur = jnp.array([[3, 1, 4, 2]])
    mel2tok = seq_ops.length_regulator(dur, 12)
    back = seq_ops.mel2token_to_dur(mel2tok, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(dur))


def test_mel2token_to_dur_matches_numpy_reference():
    from speech_editing_tpu.utils.audio.align import mel2token_to_dur as np_dur

    m2t = np.array([[1, 1, 2, 3, 3, 3, 0, 0]])
    a = np.asarray(seq_ops.mel2token_to_dur(jnp.asarray(m2t), 3))
    b = np_dur(m2t, 3)
    np.testing.assert_array_equal(a, b)


def test_expand_states_gather():
    h = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    mel2tok = jnp.array([[1, 1, 2, 0], [3, 3, 0, 0]])
    out = np.asarray(seq_ops.expand_states(h, mel2tok))
    np.testing.assert_array_equal(out[0, 0], np.asarray(h)[0, 0])
    np.testing.assert_array_equal(out[0, 2], np.asarray(h)[0, 1])
    assert (out[0, 3] == 0).all()
    np.testing.assert_array_equal(out[1, 1], np.asarray(h)[1, 2])


def test_masks_and_positions():
    lens = jnp.array([3, 5])
    m = np.asarray(seq_ops.sequence_mask(lens, 6))
    assert m.sum() == 8
    toks = jnp.array([[5, 6, 7, 0, 0]])
    pos = np.asarray(seq_ops.make_positions(toks, 0))
    np.testing.assert_array_equal(pos[0], [1, 2, 3, 0, 0])


def test_mel2ph_to_mel2word():
    mel2ph = jnp.array([[1, 1, 2, 3, 0]])
    ph2word = jnp.array([[1, 1, 2]])
    out = np.asarray(seq_ops.mel2ph_to_mel2word(mel2ph, ph2word))
    np.testing.assert_array_equal(out[0], [1, 1, 1, 2, 0])


def test_onehot_embedding_matches_gather_exactly():
    """TokenEmbedding(onehot=True) and expand_states' one-hot matmul must be
    BIT-IDENTICAL to the gather formulation (Precision.HIGHEST guards
    against TPU default-precision bf16 truncation of f32 operands)."""
    import jax
    import jax.numpy as jnp

    from speech_editing_tpu.modules.transformer import TokenEmbedding
    from speech_editing_tpu.ops.seq_ops import expand_states

    rng = np.random.RandomState(0)
    # embeddings: same params, both modes
    tokens = jnp.asarray(rng.randint(0, 300, (4, 128)))
    m_g = TokenEmbedding(300, 192, onehot=False)
    m_o = TokenEmbedding(300, 192, onehot=True)
    v = m_g.init(jax.random.PRNGKey(0), tokens)
    a = np.asarray(jax.jit(m_g.apply)(v, tokens))
    b = np.asarray(jax.jit(m_o.apply)(v, tokens))
    assert np.array_equal(a, b)

    # expand_states vs explicit gather, awkward values included
    h = jnp.asarray((rng.randn(2, 9, 64) * 1e3 + 0.1234567).astype(np.float32))
    m2t = jnp.asarray(rng.randint(0, 10, (2, 77)))
    got = np.asarray(jax.jit(expand_states)(h, m2t))
    hp = np.pad(np.asarray(h), ((0, 0), (1, 0), (0, 0)))
    want = np.take_along_axis(
        hp, np.clip(np.asarray(m2t), 0, 9)[:, :, None], axis=1)
    assert np.array_equal(got, want)
