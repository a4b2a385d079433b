"""Numeric parity against the reference implementations (gated).

Runs pieces of the mounted read-only reference toolkit (torch CPU) and
compares against our JAX ops. Skipped when the reference tree or its deps
are unavailable. These tests import-and-execute the reference for golden
values; no reference code is vendored here.
"""

import sys

import numpy as np
import pytest

REF = "/root/reference"


def _ref_available():
    import os

    return os.path.isdir(REF)


@pytest.mark.skipif(not _ref_available(), reason="reference not mounted")
def test_ssim_matches_reference_torch():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        from utils.metrics.ssim import ssim as ref_ssim  # type: ignore
    except Exception as e:
        pytest.skip(f"reference ssim import failed: {e}")
    finally:
        sys.path.remove(REF)

    import jax.numpy as jnp

    from speech_editing_tpu.ops.ssim import ssim

    rs = np.random.RandomState(0)
    a = np.abs(rs.randn(2, 60, 80)).astype(np.float32) + 3.0
    b = a + rs.randn(2, 60, 80).astype(np.float32) * 0.1
    ref = float(ref_ssim(torch.tensor(a)[:, None], torch.tensor(b)[:, None],
                         size_average=True))
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ref - ours) < 2e-3, (ref, ours)


@pytest.mark.skipif(not _ref_available(), reason="reference not mounted")
def test_vpsde_schedule_matches_reference():
    sys.path.insert(0, REF)
    try:
        from modules.speech_editing.spec_denoiser.diffusion_utils import \
            get_noise_schedule_list  # type: ignore
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)

    from speech_editing_tpu.ops.diffusion import \
        get_noise_schedule_list as ours

    for mode in ("linear", "cosine", "vpsde"):
        ref = np.asarray(get_noise_schedule_list(mode, 9, 0.1, 40.0))
        got = np.asarray(ours(mode, 9, 0.1, 40.0))
        assert np.allclose(ref, got, rtol=1e-6, atol=1e-8), mode


@pytest.mark.skipif(not _ref_available(), reason="reference not mounted")
def test_indexed_dataset_cross_reads():
    """Files written by the reference builder load in ours and vice versa."""
    torch = pytest.importorskip("torch")  # noqa: F841  (ref imports numpy only)
    import tempfile

    sys.path.insert(0, REF)
    try:
        from utils.commons.indexed_datasets import (  # type: ignore
            IndexedDataset as RefDS, IndexedDatasetBuilder as RefBuilder)
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)

    from speech_editing_tpu.data.indexed_dataset import (IndexedDataset,
                                                         IndexedDatasetBuilder)

    rs = np.random.RandomState(0)
    items = [{"a": rs.randn(20, 4), "n": i} for i in range(5)]
    with tempfile.TemporaryDirectory() as d:
        rb = RefBuilder(f"{d}/ref")
        for it in items:
            rb.add_item(it)
        rb.finalize()
        ds = IndexedDataset(f"{d}/ref")
        assert all(np.array_equal(ds[i]["a"], items[i]["a"]) for i in range(5))

        ob = IndexedDatasetBuilder(f"{d}/ours")
        for it in items:
            ob.add_item(it)
        ob.finalize()
        rds = RefDS(f"{d}/ours")
        assert all(np.array_equal(rds[i]["a"], items[i]["a"]) for i in range(5))
