"""Online serving engine (infer/online.py) + warmup API (infer/serving.py).

Two layers of coverage:

* pure scheduler policy, driven with a VIRTUAL clock against a stub
  pipeline (no device work): deadline flushes, full-batch launches,
  adaptive-tail sizing, cross-token-bucket tail merging, two-stage
  advancement, oldest-first priority, drain/close semantics;
* the real tiny spec_denoiser model: online results are BIT-IDENTICAL to
  ``edit_many`` regardless of arrival pattern (the fixed-batch
  determinism contract), the threaded server round-trips futures, and
  ``warmup()`` precompiles every program shape traffic later needs (the
  zero-compiles-after-warmup contract, asserted via the program-shape
  log — jit caches by shape, so no new shapes == no new compiles).
"""

import json
import os

import numpy as np
import pytest

from speech_editing_tpu.infer.online import OnlineEditServer
from speech_editing_tpu.infer.serving import Request


class VClock:
    def __init__(self):
        self.t = 0.0

    def now(self):
        return self.t


class StubServer:
    """Duck-typed pipeline: records every launch, no device work."""

    def __init__(self, max_batch=4, stages=("fwd",), adaptive_tail=False,
                 merge_token_tails=False):
        self.max_batch = max_batch
        self.STAGES = tuple(stages)
        self.adaptive_tail = adaptive_tail
        self.merge_token_tails = merge_token_tails
        self.calls = []  # (stage, s_b, t_b, [names], b_eff)

    def _mb(self, t_b):
        return self.max_batch

    def online_prepare(self, inp, seed):
        r = Request(inp)
        r.stage = self.STAGES[0]
        r.group = (inp.get("s_b", 32), inp.get("t_b", 128))
        return r

    def online_run(self, stage, s_b, t_b, reqs, b_eff):
        self.calls.append((stage, s_b, t_b,
                           [r.inp["name"] for r in reqs], b_eff))
        nxt = dict(zip(self.STAGES, self.STAGES[1:]))
        for r in reqs:
            if stage in nxt:
                r.stage = nxt[stage]
            else:
                r.result = {"name": r.inp["name"], "b_eff": b_eff,
                            "s_b": s_b, "t_b": t_b}


def _mk(name, s_b=32, t_b=128):
    return {"name": name, "s_b": s_b, "t_b": t_b}


def _srv(stub, clk, max_wait_ms=50.0, **kw):
    return OnlineEditServer(stub, max_wait_ms=max_wait_ms, clock=clk.now,
                            start=False, **kw)


def test_full_batch_launches_immediately():
    stub, clk = StubServer(max_batch=2), VClock()
    srv = _srv(stub, clk)
    f1, f2 = srv.submit(_mk("a")), srv.submit(_mk("b"))
    assert srv.poll_once()  # due without any clock advance
    assert stub.calls == [("fwd", 32, 128, ["a", "b"], 2)]
    assert f1.result(0)["name"] == "a" and f2.result(0)["name"] == "b"


def test_partial_chunk_waits_for_deadline():
    stub, clk = StubServer(max_batch=4), VClock()
    srv = _srv(stub, clk, max_wait_ms=50)
    f = srv.submit(_mk("a"))
    assert not srv.poll_once()
    clk.t = 0.049
    assert not srv.poll_once()
    clk.t = 0.051
    assert srv.poll_once()
    # fixed-batch contract: the partial chunk still runs at the full
    # budgeted batch (replicate padding)
    assert stub.calls == [("fwd", 32, 128, ["a"], 4)]
    assert f.done() and f.latency_s == pytest.approx(0.051)


def test_adaptive_tail_batch_size():
    stub, clk = StubServer(max_batch=8, adaptive_tail=True), VClock()
    srv = _srv(stub, clk)
    for n in "abc":
        srv.submit(_mk(n))
    clk.t = 1.0
    assert srv.poll_once()
    assert stub.calls[0][4] == 4  # pow2ceil(3)


def test_merge_across_token_buckets_same_frame_bucket():
    stub = StubServer(max_batch=4, merge_token_tails=True)
    clk = VClock()
    srv = _srv(stub, clk)
    srv.submit(_mk("a", s_b=32, t_b=128))
    clk.t = 0.01
    srv.submit(_mk("b", s_b=64, t_b=128))
    srv.submit(_mk("c", s_b=64, t_b=256))  # different frame bucket
    clk.t = 0.07
    assert srv.poll_once()
    # one merged launch at the members' max token bucket; the other frame
    # bucket stays separate
    assert stub.calls == [("fwd", 64, 128, ["a", "b"], 4)]
    assert srv.poll_once()
    assert stub.calls[1] == ("fwd", 64, 256, ["c"], 4)


def test_no_merge_when_disabled():
    stub = StubServer(max_batch=4, merge_token_tails=False)
    clk = VClock()
    srv = _srv(stub, clk)
    srv.submit(_mk("a", s_b=32, t_b=128))
    srv.submit(_mk("b", s_b=64, t_b=128))
    clk.t = 0.06
    assert srv.poll_once() and srv.poll_once()
    assert [(c[1], c[3]) for c in stub.calls] == [(32, ["a"]), (64, ["b"])]


def test_two_stage_pipeline_and_deadline_carryover():
    stub = StubServer(max_batch=4, stages=("dur", "diff"))
    clk = VClock()
    srv = _srv(stub, clk, max_wait_ms=50)
    f = srv.submit(_mk("a"))
    clk.t = 0.06
    assert srv.poll_once()          # dur stage flushes at the deadline
    assert not f.done()
    # the request already paid its wait: the diff stage is due NOW (stage
    # deadlines anchor at submit time), no second 50 ms penalty
    assert srv.poll_once()
    assert [c[0] for c in stub.calls] == ["dur", "diff"]
    assert f.result(0)["name"] == "a"
    assert f.latency_s == pytest.approx(0.06)


def test_oldest_head_runs_first():
    stub, clk = StubServer(max_batch=4), VClock()
    srv = _srv(stub, clk)
    srv.submit(_mk("late", t_b=256))
    clk.t = 0.01
    srv.submit(_mk("early", t_b=128))
    # make BOTH due; the 256 group's head is older
    clk.t = 0.06
    assert srv.poll_once()
    assert stub.calls[0][3] == ["late"]


def test_burst_splits_into_full_chunks():
    stub, clk = StubServer(max_batch=2), VClock()
    srv = _srv(stub, clk)
    fs = [srv.submit(_mk(f"r{i}")) for i in range(5)]
    assert srv.poll_once() and srv.poll_once()   # two full chunks, due now
    assert not srv.poll_once()                   # tail not due yet
    srv.drain()
    assert [c[3] for c in stub.calls] == [["r0", "r1"], ["r2", "r3"], ["r4"]]
    assert all(f.done() for f in fs)


def test_threaded_stub_roundtrip():
    import time

    stub = StubServer(max_batch=4)
    srv = OnlineEditServer(stub, max_wait_ms=5)
    try:
        fs = [srv.submit(_mk(f"x{i}")) for i in range(3)]
        for f in fs:
            assert f.result(timeout=10)["b_eff"] == 4
        assert all(f.latency_s is not None for f in fs)
        t0 = time.monotonic()
    finally:
        srv.close()
    assert time.monotonic() - t0 < 10


def test_two_workers_serve_all_and_results_match():
    """workers=2 overlaps chunk runs across threads; every future still
    resolves with its own request's result (per-row keyed, no cross-chunk
    state)."""
    import time

    class SlowServer(StubServer):
        def online_run(self, stage, s_b, t_b, reqs, b_eff):
            time.sleep(0.02)  # emulate a device fetch the 2nd thread hides
            super().online_run(stage, s_b, t_b, reqs, b_eff)

    stub = SlowServer(max_batch=2)
    srv = OnlineEditServer(stub, max_wait_ms=5, workers=2)
    try:
        fs = [srv.submit(_mk(f"w{i}", t_b=128 + (i % 2))) for i in range(12)]
        for i, f in enumerate(fs):
            assert f.result(timeout=10)["name"] == f"w{i}"
    finally:
        srv.close()
    served = sorted(n for c in stub.calls for n in c[3])
    assert served == sorted(f"w{i}" for i in range(12))


def test_close_flushes_queued_requests():
    stub = StubServer(max_batch=8)
    srv = OnlineEditServer(stub, max_wait_ms=10_000)  # deadline never fires
    f = srv.submit(_mk("a"))
    srv.close()  # drains instead of abandoning
    assert f.result(0)["name"] == "a"


def test_chunk_failure_propagates_to_futures_only():
    """A device-program failure fails THAT chunk's futures; the server
    keeps serving later chunks."""

    class FlakyServer(StubServer):
        def online_run(self, stage, s_b, t_b, reqs, b_eff):
            if any(r.inp["name"] == "bad" for r in reqs):
                raise RuntimeError("boom")
            super().online_run(stage, s_b, t_b, reqs, b_eff)

    stub, clk = FlakyServer(max_batch=1), VClock()
    srv = _srv(stub, clk)
    f_bad = srv.submit(_mk("bad"))
    f_ok = srv.submit(_mk("ok"))
    srv.drain()
    assert f_ok.result(0)["name"] == "ok"
    with pytest.raises(RuntimeError, match="boom"):
        f_bad.result(0)


def test_submit_after_close_fails_fast():
    stub = StubServer(max_batch=4)
    srv = OnlineEditServer(stub, max_wait_ms=5)
    srv.close()
    f = srv.submit(_mk("late"))
    with pytest.raises(RuntimeError, match="closed"):
        f.result(0)


def test_preprocess_failure_surfaces_on_future():
    class BadPrep(StubServer):
        def online_prepare(self, inp, seed):
            raise ValueError("bad request")

    srv = _srv(BadPrep(), VClock())
    f = srv.submit(_mk("x"))
    with pytest.raises(ValueError, match="bad request"):
        f.result(0)


def test_plan_chunks_merges_token_tails():
    from types import SimpleNamespace

    from speech_editing_tpu.infer.serving import BatchedInPlaceEditServer

    srv = BatchedInPlaceEditServer(SimpleNamespace(hp={}), max_batch=4,
                                   merge_token_tails=True)
    groups = {(32, 128): list("abcde"), (64, 128): list("fg"),
              (64, 256): list("h")}
    plan = srv._plan_chunks(groups)
    assert (32, 128, list("abcd"), 4) in plan          # full chunk intact
    assert (64, 128, list("efg"), 4) in plan           # merged tails
    assert (64, 256, list("h"), 4) in plan             # no cross-frame merge
    assert len(plan) == 3
    # without the flag: one tail chunk per group
    srv_off = BatchedInPlaceEditServer(SimpleNamespace(hp={}), max_batch=4)
    assert len(srv_off._plan_chunks(groups)) == 4


# -- real tiny model ----------------------------------------------------------

@pytest.fixture(scope="module")
def online_env(tmp_path_factory):
    from tests.helpers import make_spec_denoiser_serve_env

    return make_spec_denoiser_serve_env(tmp_path_factory.mktemp("online"))


@pytest.fixture(scope="module")
def online_infer(online_env):
    from speech_editing_tpu.infer.spec_denoiser import SpecDenoiserInfer

    return SpecDenoiserInfer(online_env)


def _requests():
    from tests.test_serving import REQ_A, REQ_B, REQ_C, _make_request

    return [_make_request(**REQ_A), _make_request(**REQ_B),
            _make_request(**REQ_C)]


def test_online_matches_offline_bit_exact(online_infer):
    """Arrival-pattern invariance: with adaptive_tail and merge off, every
    chunk runs the bucket's fixed-batch program, so online results equal
    edit_many bit-for-bit even when requests arrive (and launch) in
    different chunkings."""
    from speech_editing_tpu.infer.serving import BatchedEditServer

    kw = dict(max_batch=4, frame_buckets=(64, 128), token_buckets=(64,))
    offline = BatchedEditServer(online_infer, **kw).edit_many(
        _requests(), seed=7)

    clk = VClock()
    srv = OnlineEditServer(BatchedEditServer(online_infer, **kw),
                           max_wait_ms=50, clock=clk.now, start=False)
    reqs = _requests()
    f_a = srv.submit(reqs[0], seed=7)
    srv.drain()                      # A runs alone (chunk of 1, padded)
    f_b = srv.submit(reqs[1], seed=7)
    f_c = srv.submit(reqs[2], seed=7)
    srv.drain()                      # B+C share a chunk
    for f, off in zip((f_a, f_b, f_c), offline):
        np.testing.assert_array_equal(f.result(0)["mel_out"], off["mel_out"])


def test_online_threaded_real_model(online_infer):
    from speech_editing_tpu.infer.serving import BatchedEditServer

    kw = dict(max_batch=4, frame_buckets=(64, 128), token_buckets=(64,))
    offline = BatchedEditServer(online_infer, **kw).edit_many(
        _requests(), seed=7)
    with OnlineEditServer(BatchedEditServer(online_infer, **kw),
                          max_wait_ms=20) as srv:
        futures = [srv.submit(r, seed=7) for r in _requests()]
        results = [f.result(timeout=600) for f in futures]
    for r, off in zip(results, offline):
        np.testing.assert_array_equal(r["mel_out"], off["mel_out"])
        assert len(r["wav_out"]) == r["t_frames"] * online_infer.hp["hop_size"]


def test_online_merge_across_token_buckets_real_model(online_infer):
    """Cross-token-bucket packing with the REAL model: a deadline flush
    merges a short-text and a long-text request (different token buckets,
    same frame bucket) into one chunk at the larger token bucket; the
    short request's result matches serving it alone up to the documented
    token-padding-inertness band."""
    from tests.test_serving import REQ_A, _make_request
    from speech_editing_tpu.infer.serving import BatchedEditServer

    req_long = dict(
        name="long", text="this is a test sentence",
        edited_text="this is a very long wonderful test sentence indeed",
        region="[3,4]", edited_region="[3,8]", seed=5)
    infer = online_infer
    item_a = infer.preprocess_input(_make_request(**REQ_A))
    item_l = infer.preprocess_input(_make_request(**req_long))
    s_a = len(item_a["edited_ph_token"])
    s_l = len(item_l["edited_ph_token"])
    assert s_a < s_l  # distinct token buckets below

    kw = dict(max_batch=2, frame_buckets=(64, 128),
              token_buckets=(s_a, s_l))
    alone = BatchedEditServer(infer, **kw).edit_many(
        [_make_request(**REQ_A)], seed=7)[0]

    clk = VClock()
    srv = OnlineEditServer(BatchedEditServer(infer, **kw), max_wait_ms=50,
                           clock=clk.now, start=False,
                           merge_token_tails=True)
    f_a = srv.submit(_make_request(**REQ_A), seed=7)
    f_l = srv.submit(_make_request(**req_long), seed=7)
    clk.t = 0.1
    srv.drain()
    # the dur stage merged for sure (both share fb(T0)); the diff stage
    # merges too unless the two edits land in different frame buckets
    first = srv.launches[0]
    assert first[0] == "dur" and first[3] == 2 and first[5] == 1
    assert first[1] == srv.server._tb(s_l)  # ran at the larger bucket
    np.testing.assert_allclose(f_a.result(0)["mel_out"], alone["mel_out"],
                               atol=2e-5)
    assert np.isfinite(f_l.result(0)["mel_out"]).all()


def test_warmup_covers_all_traffic_shapes(online_infer):
    """Zero compiles during a warmed run: every program shape the traffic
    produces is already in a warmed server's shape log (jit caches by
    shape, so shape-set inclusion == no new compiles)."""
    from speech_editing_tpu.infer.serving import BatchedEditServer

    kw = dict(max_batch=2, frame_buckets=(64, 128, 256),
              token_buckets=(32, 64))
    traffic_srv = BatchedEditServer(online_infer, **kw)
    traffic_srv.edit_many(_requests(), seed=7)
    needed = set(traffic_srv.program_shapes)
    assert needed  # the log actually records launches

    warmed = BatchedEditServer(online_infer, **kw)
    n = warmed.warmup()
    assert n == len(warmed.program_shapes) > 0
    missing = needed - warmed.program_shapes
    assert not missing, f"traffic shapes not covered by warmup: {missing}"
    # idempotent: a second warmup adds no shapes (all programs cached)
    assert warmed.warmup() == 0


def test_serve_cli_jsonl(online_env, tmp_path):
    """`python -m speech_editing_tpu.infer.serve` streams JSONL requests
    through the online engine and writes result wavs + latency lines."""
    import yaml

    from speech_editing_tpu.infer.serve import main as serve_main
    from speech_editing_tpu.utils.audio.io import save_wav
    from speech_editing_tpu.utils.text.processors import (get_txt_processor_cls,
                                                          txt_to_ph)

    sr, hop, n_frames = 22050, 256, 40
    wav = (0.3 * np.sin(2 * np.pi * 150 *
                        np.arange(n_frames * hop) / sr)).astype(np.float32)
    wav_fn = str(tmp_path / "src.wav")
    save_wav(wav, wav_fn, sr)
    tp = get_txt_processor_cls("en")
    ph, *_ = txt_to_ph(tp, "this is a test sentence")
    s = len(ph.split(" "))
    t_max = n_frames + 8
    mel2ph = [int(x) for x in
              np.minimum(np.arange(t_max) * s // t_max + 1, s)]

    # config: the work-dir root + every env hp (set_hparams re-derives
    # work_dir as <work_dir_root>/<exp_name>)
    cfg = {k: v for k, v in dict(online_env).items()
           if isinstance(v, (int, float, str, bool, list, dict))}
    root, exp = (os.path.dirname(online_env["work_dir"]),
                 os.path.basename(online_env["work_dir"]))
    cfg["work_dir_root"] = root
    cfg_fn = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(cfg, open(cfg_fn, "w"))

    reqs = [{"item_name": f"srv_{i}", "text": "this is a test sentence",
             "edited_text": "this is a wonderful test sentence",
             "region": "[3,4]", "edited_region": "[3,5]",
             "wav_fn_orig": wav_fn, "mel2ph": mel2ph} for i in range(2)]
    req_fn = str(tmp_path / "reqs.jsonl")
    with open(req_fn, "w") as f:
        for r in reqs:
            f.write(json.dumps(r) + "\n")

    out_dir = str(tmp_path / "out")
    serve_main(["--config", cfg_fn, "--exp_name", exp, "--jsonl", req_fn,
                "--out-dir", out_dir, "--max-wait-ms", "20",
                "--max-batch", "2"])
    for i in range(2):
        assert os.path.exists(f"{out_dir}/srv_{i}.wav")


def test_warmup_inplace_server(online_env, tmp_path_factory):
    """The single-stage (in-place) server warms its forward program for
    every bucket/batch combination, including the adaptive pow2 ladder."""
    from types import SimpleNamespace

    from speech_editing_tpu.infer.serving import BatchedInPlaceEditServer

    calls = []

    class _FakeInfer:
        hp = dict(online_env)
        _token_field = "ph_token"
        vocoder = SimpleNamespace(
            device_batched=False,
            spec2wav_batch=lambda m: np.zeros((m.shape[0], 4)))

        def _model_mel_out_batch(self, txt, mels, m2p, tm, spk, f0, uv):
            calls.append((txt.shape, mels.shape))
            return np.zeros_like(mels)

    fake = _FakeInfer()
    srv = BatchedInPlaceEditServer(fake, max_batch=4,
                                   frame_buckets=(64, 128),
                                   token_buckets=(32,), adaptive_tail=True)
    n = srv.warmup()
    # pow2 ladder {1,2,4} x 2 frame buckets x 1 token bucket
    assert sorted(c[0][0] for c in calls) == [1, 1, 2, 2, 4, 4]
    assert n == len(srv.program_shapes) == 6
