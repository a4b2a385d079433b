"""Weight-only int8 serving quantization (infer/quant.py).

Covers the representation (per-output-channel absmax, small/1-D leaves
exact), the jit-argument contract (the quantized tree passes through jit
and dequantizes in-graph), and the serving integration
(hp['serve_quant_int8'] end to end on the tiny spec_denoiser env, output
close to the fp32 path)."""

import numpy as np

from speech_editing_tpu.infer.quant import (dequantize_tree, max_quant_error,
                                            quantize_tree, quantized_bytes)


def _tree(rs):
    return {
        "dense": {"kernel": rs.randn(64, 128).astype(np.float32) * 0.1,
                  "bias": rs.randn(128).astype(np.float32)},
        "conv": {"kernel": rs.randn(3, 64, 64).astype(np.float32)},
        "small": {"kernel": rs.randn(4, 4).astype(np.float32)},
        "ints": {"table": rs.randint(0, 5, (64, 64)).astype(np.int32)},
    }


def test_quantize_roundtrip_error_bound():
    rs = np.random.RandomState(0)
    params = _tree(rs)
    q = quantize_tree(params, min_size=1024)
    # quantized: dense.kernel (8192) + conv.kernel (12288); exact: bias
    # (1-D), small (16 < min), ints (non-float)
    assert "__q8__" in q["dense"]["kernel"]
    assert "__q8__" in q["conv"]["kernel"]
    assert isinstance(q["small"]["kernel"], np.ndarray)
    assert isinstance(q["ints"]["table"], np.ndarray)
    np.testing.assert_array_equal(q["dense"]["bias"], params["dense"]["bias"])

    # absmax symmetric: |err| <= scale/2 = absmax/254 per output channel
    err = max_quant_error(params, q)
    worst = max(np.abs(params["dense"]["kernel"]).max(),
                np.abs(params["conv"]["kernel"]).max()) / 254 * 1.001
    assert 0 < err <= worst

    deq = dequantize_tree(q)
    assert deq["dense"]["kernel"].shape == (64, 128)
    np.testing.assert_allclose(
        np.asarray(deq["conv"]["kernel"]), params["conv"]["kernel"],
        atol=np.abs(params["conv"]["kernel"]).max() / 200)

    assert quantized_bytes(q) < quantized_bytes(params)


def test_quantized_tree_is_a_valid_jit_argument():
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(1)
    params = _tree(rs)
    q = quantize_tree(params, min_size=1024)
    x = jnp.asarray(rs.randn(2, 64).astype(np.float32))

    @jax.jit
    def fwd(qp, x):
        p = dequantize_tree(qp)
        return x @ p["dense"]["kernel"] + p["dense"]["bias"]

    out = np.asarray(fwd(q, x))
    ref = np.asarray(x) @ np.asarray(
        dequantize_tree(q)["dense"]["kernel"]) + params["dense"]["bias"]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_serving_int8_end_to_end(tmp_path_factory):
    """hp['serve_quant_int8'] routes the whole edit pipeline through
    quantized weights: runs, stays finite, and the composited mel is
    close to the fp32 serving result (weight-only error only)."""
    from tests.helpers import make_spec_denoiser_serve_env
    from tests.test_serving import REQ_A, _make_request
    from speech_editing_tpu.infer.serving import BatchedEditServer
    from speech_editing_tpu.infer.spec_denoiser import SpecDenoiserInfer

    hp = make_spec_denoiser_serve_env(tmp_path_factory.mktemp("quant"))
    kw = dict(max_batch=2, frame_buckets=(64, 128), token_buckets=(64,))
    res_fp = BatchedEditServer(SpecDenoiserInfer(hp), **kw).edit_many(
        [_make_request(**REQ_A)], seed=7)[0]
    hp_q = dict(hp, serve_quant_int8=True, quant_min_size=64)
    res_q = BatchedEditServer(SpecDenoiserInfer(hp_q), **kw).edit_many(
        [_make_request(**REQ_A)], seed=7)[0]
    assert np.isfinite(res_q["mel_out"]).all()
    # quantized DUR predictions can shift a rounding boundary, so frame
    # counts may differ by a few frames (which also misaligns the spliced
    # tail — deltas there reflect the shift, not the weight error)
    assert abs(res_q["t_frames"] - res_fp["t_frames"]) <= 4
    # the HEAD (pre-edit) region is copied from the source mel by the
    # composite in both paths — must agree exactly
    head = int(np.argmax(res_fp["time_mel_masks"][:, 0] > 0))
    assert head > 0
    np.testing.assert_array_equal(res_q["mel_out"][:head],
                                  res_fp["mel_out"][:head])
    # regenerated region: same order of magnitude (weight-only error on a
    # tiny near-init model; the flagship quality deltas are measured on
    # hardware — scripts/bench_quant_serving.py / BASELINE.md)
    t = min(res_q["t_frames"], res_fp["t_frames"])
    delta = np.abs(res_q["mel_out"][:t] - res_fp["mel_out"][:t]).max()
    assert 0 < delta < 10.0, delta
