"""Batched region-edit serving engines (production deployment path).

Two servers, one per inference style: :class:`BatchedEditServer` for the
diffusion path (FluentSpeech — duration inpainting + reverse diffusion,
per-request noise) and
:class:`BatchedInPlaceEditServer` for the deterministic in-place families
(CampNet / A3T / EditSpeech — one forward on the original frame grid).
``SpecDenoiserInfer.make_server`` / ``_InPlaceEditInfer.make_server``
pick the right one for the experiment's task.

Beyond-parity: the reference serves edits strictly one at a time
(``inference/tts/spec_denoiser.py:247-277`` loops ``infer_once`` over CSV
rows, one model forward + one vocoder call per row). On a TPU that leaves
most of the MXU idle — at serving batch sizes the diffusion denoiser and
the HiFi-GAN upsampling stack are far from saturating the chip.

TPU-first design:

* all dynamic work (g2p, region resolution, duration length-regulation,
  frame splicing) stays host-side in numpy, exactly as in the per-item
  driver (the helpers in ``infer/spec_denoiser.py`` are shared verbatim);
* device work runs BATCHED under static ``(batch, frame-bucket,
  token-bucket)`` shapes: requests are grouped into the smallest bucket
  that fits, padded with masks (mask semantics are identical to training
  padding — ``mel2ph==0`` / ``txt==0`` rows are inert), and each distinct
  bucket shape compiles ONCE and is cached (persistent compile cache);
* three batched device programs per bucket: duration inpainting, reverse
  diffusion + composite, vocoder — the same two acoustic programs as the
  per-item path plus one batched vocode.

Determinism: the reverse diffusion is keyed per REQUEST
(``fold_in(PRNGKey(seed), crc32(request identity))`` — see
``infer.spec_denoiser.request_prng_key``) and the model draws each row's
noise from its own key, so a request's mel depends only on (seed, request,
frame-bucket shape): row index, chunk order, and batch composition
provably cannot change a result, and at the exact-fit bucket the output is
bit-identical to the per-item driver (asserted in ``tests/test_serving.py``).
Batch-padding rows replicate a real request (never all-zero rows) and are
discarded.

Note on vocoded tails: the batched vocoder sees the mel padded to the
frame bucket; within the generator's receptive field of the true end the
waveform can differ marginally from the per-item path (which zero-pads at
its own, shorter boundary). Mel-level outputs are bit-comparable.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np

from speech_editing_tpu.infer.spec_denoiser import (SpecDenoiserInfer,
                                                    dur_inpaint_prep,
                                                    dur_to_mel2ph,
                                                    request_prng_key,
                                                    splice_edit)


def _bucket(n: int, buckets: Sequence[int], multiple: int = 1) -> int:
    """Smallest listed bucket >= n (rounded up to `multiple`); sizes past
    the largest bucket round up to the next multiple of the last stride so
    oversized requests still get a static (cacheable) shape."""
    n = max(int(n), 1)
    for b in buckets:
        b = -(-b // multiple) * multiple
        if n <= b:
            return b
    stride = max(buckets[-1] - (buckets[-2] if len(buckets) > 1 else 0),
                 multiple)
    b = buckets[-1]
    while b < n:
        b += stride
    return -(-b // multiple) * multiple


def _pow2ceil(n: int) -> int:
    """Smallest power of two >= n (adaptive tail-chunk program size)."""
    return 1 << max(n - 1, 0).bit_length()


def _pad_to(arr: np.ndarray, length: int) -> np.ndarray:
    """Zero-pad axis 0 of `arr` to `length`."""
    if arr.shape[0] >= length:
        return arr[:length]
    pad = [(0, length - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


class BatchedEditServer:
    """Batched FluentSpeech region-edit server.

    Wraps a ``SpecDenoiserInfer`` (model + vocoder + spk embedder are built
    once); ``edit_many`` takes a list of raw request dicts (same schema as
    ``infer_once``) and returns one result dict per request, running the
    device work in MXU-saturating batches.
    """

    def __init__(self, infer_ins: Optional[SpecDenoiserInfer] = None,
                 hp: Optional[Any] = None, max_batch: int = 8,
                 frame_buckets: Sequence[int] = (128, 256, 512, 1024, 1536),
                 token_buckets: Sequence[int] = (32, 64, 128, 256),
                 frames_batch_budget: Optional[int] = None,
                 adaptive_tail: Optional[bool] = None):
        assert infer_ins is not None or hp is not None
        self.infer = infer_ins or SpecDenoiserInfer(hp)
        self.hp = self.infer.hp
        self.max_batch = int(max_batch)
        self.frame_buckets = tuple(sorted(frame_buckets))
        self.token_buckets = tuple(sorted(token_buckets))
        self.fm = int(self.hp.get("frames_multiple", 1))
        # cap batch x frames per device program: big-bucket big-batch
        # programs can exceed the TPU compile helper's memory (measured on
        # v5e: B=16 x T=1536 + HiFi-GAN V1 fails to compile, B=8 works) —
        # a budget of 16384 keeps <=1024-frame buckets at max_batch
        # and shrinks the 1536 bucket to 8 (pow2-floored). Deterministic per bucket,
        # so the request-level determinism contract is unchanged (a
        # request's result depends on its bucket's effective batch).
        if frames_batch_budget is None:
            frames_batch_budget = int(self.hp.get("serve_frames_batch_budget",
                                                  0))
        self.frames_batch_budget = int(frames_batch_budget)
        # adaptive tail: run a bucket's FINAL partial chunk at the next
        # pow2 >= its real size instead of replicate-padding to the full
        # batch (mixed-traffic chunk fill measured 0.667 — a third of
        # device time went to padding rows). Opt-in because it relaxes the
        # determinism contract: a request in an adaptive tail runs under a
        # batch size that depends on how many requests co-submitted, and a
        # recompiled batch shape can reassociate within-row reductions
        # (~1e-6 float drift vs the fixed-batch program; never cross-row
        # leakage). Default off = bit-exact batch-composition invariance.
        if adaptive_tail is None:
            adaptive_tail = bool(self.hp.get("serve_adaptive_tail", False))
        self.adaptive_tail = bool(adaptive_tail)

    # -- bucketing ------------------------------------------------------------
    def _fb(self, n: int) -> int:
        return _bucket(n, self.frame_buckets, self.fm)

    def _tb(self, n: int) -> int:
        return _bucket(n, self.token_buckets)

    def _mb(self, t_b: int) -> int:
        """Effective batch for a frame bucket under the budget, floored to
        a power of two (measured: B=12 x T=1024 runs 21.6 ms/edit vs 12.8
        at B=16 — non-pow2 batches tile poorly on the MXU)."""
        if self.frames_batch_budget <= 0:
            return self.max_batch
        mb = max(1, min(self.max_batch, self.frames_batch_budget // t_b))
        return 1 << (mb.bit_length() - 1)

    def _chunks(self, idxs: List[int], t_b: Optional[int] = None):
        mb = self._mb(t_b) if t_b else self.max_batch
        for i in range(0, len(idxs), mb):
            chunk = idxs[i: i + mb]
            if self.adaptive_tail and len(chunk) < mb:
                yield chunk, _pow2ceil(len(chunk))
            else:
                yield chunk, mb

    # -- pipeline -------------------------------------------------------------
    def edit_many(self, inputs: List[dict], seed: Optional[int] = None
                  ) -> List[dict]:
        import jax
        import jax.numpy as jnp

        if not inputs:
            return []
        seed = int(self.hp.get("seed", 1234)) if seed is None else int(seed)
        base_key = jax.random.PRNGKey(seed)

        # stage A (host): preprocess + speaker embeddings
        items = [self.infer.preprocess_input(inp) for inp in inputs]
        spk = np.stack([self.infer.spk_embedder(it["wav"]) for it in items])

        # stage B (device, batched): duration inpainting per (S, T0) bucket
        preps = [dur_inpaint_prep(it) for it in items]
        groups: dict = {}
        for i, it in enumerate(items):
            key = (self._tb(len(it["edited_ph_token"])),
                   self._fb(len(it["mel2ph"])))
            groups.setdefault(key, []).append(i)
        dur_pred: List[Optional[np.ndarray]] = [None] * len(items)
        for (s_b, t_b), idxs in sorted(groups.items()):
            for chunk, mb in self._chunks(idxs, t_b):
                rows = chunk + [chunk[0]] * (mb - len(chunk))
                txt = np.stack([_pad_to(items[i]["edited_ph_token"], s_b)
                                for i in rows])
                tm = np.stack([_pad_to(
                    preps[i][2].astype(np.float32), t_b) for i in rows])
                m2p = np.stack([_pad_to(preps[i][1], t_b) for i in rows])
                mdur = np.stack([_pad_to(preps[i][0], s_b) for i in rows])
                out = self.infer._predict_dur(
                    self.infer.variables, jnp.asarray(txt),
                    jnp.asarray(tm)[:, :, None], jnp.asarray(m2p),
                    jnp.asarray(mdur), jnp.asarray(spk[rows]))
                d = np.asarray(out["dur"], np.float32)
                for r, i in enumerate(chunk):
                    dur_pred[i] = d[r, :len(items[i]["edited_ph_token"])]

        # stage C (host): length-regulate + splice; per-request rng keys
        splices = []
        row_key = []
        for i, it in enumerate(items):
            m2p_pred, m2w_pred = dur_to_mel2ph(it, dur_pred[i], self.fm)
            splices.append(splice_edit(it, m2p_pred, m2w_pred, self.fm))
            row_key.append(request_prng_key(base_key, it))
        row_key = jnp.stack(row_key)

        # stage D (device, batched): reverse diffusion per (S, T_new) bucket
        groups = {}
        for i, sp in enumerate(splices):
            key = (self._tb(len(items[i]["edited_ph_token"])),
                   self._fb(sp["t_new"]))
            groups.setdefault(key, []).append(i)
        results: List[Optional[dict]] = [None] * len(items)
        for (s_b, t_b), idxs in sorted(groups.items()):
            for chunk, mb in self._chunks(idxs, t_b):
                rows = chunk + [chunk[0]] * (mb - len(chunk))
                txt = np.stack([_pad_to(items[i]["edited_ph_token"], s_b)
                                for i in rows])
                tm = np.stack([_pad_to(splices[i]["time_mel_masks"], t_b)
                               for i in rows])
                m2p = np.stack([_pad_to(splices[i]["mel2ph"], t_b)
                                for i in rows])
                ref = np.stack([_pad_to(splices[i]["ref_mels"], t_b)
                                for i in rows])
                f0 = np.stack([_pad_to(splices[i]["f0"], t_b) for i in rows])
                uv = np.stack([_pad_to(splices[i]["uv"], t_b) for i in rows])
                out = self.infer._infer(
                    self.infer.variables, jnp.asarray(txt), jnp.asarray(tm),
                    jnp.asarray(m2p), jnp.asarray(spk[rows]),
                    jnp.asarray(ref), jnp.asarray(f0), jnp.asarray(uv),
                    row_key[np.asarray(rows)])
                mel_out = np.asarray(out["mel_out"], np.float32)
                comp = mel_out * tm + ref * (1 - tm)

                # stage E (device, batched): vocode the bucket in ONE device
                # program; host vocoders (per-item Python loops) skip the
                # replicated padding rows — no static-shape constraint there
                if getattr(self.infer.vocoder, "device_batched", False):
                    wavs = self.infer.vocoder.spec2wav_batch(comp)
                else:
                    wavs = self.infer.vocoder.spec2wav_batch(
                        comp[:len(chunk)])
                hop = int(self.hp["hop_size"])
                for r, i in enumerate(chunk):
                    t_new = splices[i]["t_new"]
                    results[i] = {
                        "mel_out": comp[r, :t_new],
                        "wav_out": np.asarray(wavs[r][:t_new * hop]),
                        "t_frames": t_new,
                        "time_mel_masks": splices[i]["time_mel_masks"],
                        "ref_mels": splices[i]["ref_mels"],
                    }
        return results  # type: ignore[return-value]


class BatchedInPlaceEditServer:
    """Batched serving for the in-place editing families (CampNet / A3T /
    EditSpeech — ``infer/editors.py``).

    These models keep the original frame grid and regenerate only the
    masked span with ONE deterministic forward (no duration inpainting, no
    reverse diffusion, no per-request noise), so the batched pipeline is
    two device programs per ``(batch, token-bucket, frame-bucket)`` chunk:
    the model forward (via the family's ``_model_mel_out_batch`` hook) and
    the vocoder. Bucketing/padding semantics match ``BatchedEditServer``:
    padding rows replicate a real request and are discarded.

    Determinism contract: every family computes per-row (no cross-row
    math, no sampling), and chunks are always padded to ``max_batch`` by
    replicating a real row — so every chunk of a bucket runs the SAME
    compiled program, and a request's result is bit-exactly invariant to
    row placement, chunk order, and co-batched requests; it depends only
    on (request, token bucket, frame bucket, max_batch). At
    ``max_batch=1`` and the exact-fit bucket the program shape equals the
    per-item driver's and the output is bit-identical; a different batch
    or bucket shape recompiles, where XLA may reassociate within-row
    reductions (~1e-6 float drift — there is no cross-row math to leak).
    Bucket-padding semantics differ by family (all asserted with
    perturbed/nonzero-bias weights in ``tests/test_serving.py``):

    * CampNet masks padded tokens/frames at the attention KEYS (a
      documented reference-bug fix — the reference's decoder masks values
      only, ``speech_editing/commons/transformer.py:780-801``) and its
      conv/norm stacks re-mask per layer, so frame/token-bucket padding is
      numerically inert: padded buckets agree with exact-fit up to that
      float reassociation;
    * EditSpeech right-aligns the backward-LSTM scan to start from the
      TRUE end of each row (``models/editspeech.py``) and its other paths
      are causal or pointwise, so bucket padding is inert the same way
      (``hp['ref_pad_compat']`` restores the reference's full-axis flip
      for torch-parity checks);
    * A3T is structurally bucket-dependent: frame-bucket padding sits
      BETWEEN the mel segment and the concatenated text segment, shifting
      their relative-position distances, and the conformer conv module is
      deliberately unmasked (faithful reference behavior,
      ``modules/conformer.py``) — padded-bucket output is still fully
      deterministic given (bucket shape, max_batch) and batch-composition
      invariant, but can differ from the exact-fit bucket beyond float
      noise. Deploy A3T with a bucket set matched to the traffic (or
      exact-fit buckets for bit-stability across bucket choices).

    Reference contrast: ``inference/tts/{campnet,a3t,editspeech}.py`` all
    loop one item at a time.
    """

    def __init__(self, infer_ins, max_batch: int = 8,
                 frame_buckets: Sequence[int] = (128, 256, 512, 1024, 1536),
                 token_buckets: Sequence[int] = (32, 64, 128, 256),
                 frames_batch_budget: Optional[int] = None,
                 adaptive_tail: Optional[bool] = None):
        self.infer = infer_ins
        self.hp = infer_ins.hp
        self.max_batch = int(max_batch)
        self.frame_buckets = tuple(sorted(frame_buckets))
        self.token_buckets = tuple(sorted(token_buckets))
        # frame buckets must honor frames_multiple like BatchedEditServer:
        # the FastSpeech conditioner clips mel2ph at t//fm*fm (models/fs.py),
        # so a non-multiple bucket would zero conditioning near the edge and
        # silently diverge from the per-item path
        self.fm = int(self.hp.get("frames_multiple", 1))
        # batch x frames compile budget — see BatchedEditServer
        if frames_batch_budget is None:
            frames_batch_budget = int(self.hp.get("serve_frames_batch_budget",
                                                  0))
        self.frames_batch_budget = int(frames_batch_budget)
        # adaptive tail-chunk sizing — see BatchedEditServer (opt-in: it
        # relaxes bit-exact batch-composition invariance to ~1e-6
        # recompile reassociation for requests landing in a tail chunk)
        if adaptive_tail is None:
            adaptive_tail = bool(self.hp.get("serve_adaptive_tail", False))
        self.adaptive_tail = bool(adaptive_tail)

    def _fb(self, n: int) -> int:
        return _bucket(n, self.frame_buckets, self.fm)

    def _tb(self, n: int) -> int:
        return _bucket(n, self.token_buckets)

    def _mb(self, t_b: int) -> int:
        # pow2-floored budgeted batch — see BatchedEditServer._mb
        if self.frames_batch_budget <= 0:
            return self.max_batch
        mb = max(1, min(self.max_batch, self.frames_batch_budget // t_b))
        return 1 << (mb.bit_length() - 1)

    def _chunks(self, idxs: List[int], t_b: Optional[int] = None):
        mb = self._mb(t_b) if t_b else self.max_batch
        for i in range(0, len(idxs), mb):
            chunk = idxs[i: i + mb]
            if self.adaptive_tail and len(chunk) < mb:
                yield chunk, _pow2ceil(len(chunk))
            else:
                yield chunk, mb

    def edit_many(self, inputs: List[dict], seed: Optional[int] = None
                  ) -> List[dict]:
        # `seed` accepted for API symmetry with BatchedEditServer; the
        # in-place families are deterministic so it is unused.
        del seed
        if not inputs:
            return []
        # stage A (host): preprocess + frame masks + speaker embeddings
        items = [self.infer.preprocess_input(inp) for inp in inputs]
        spk = np.stack([self.infer.spk_embedder(it["wav"]) for it in items])
        tms = [self.infer._frame_mask(it)[:, None] for it in items]
        tok_field = self.infer._token_field

        # stage B (device, batched): model forward + composite + vocode
        groups: dict = {}
        for i, it in enumerate(items):
            key = (self._tb(len(it[tok_field])), self._fb(len(it["mel"])))
            groups.setdefault(key, []).append(i)
        results: List[Optional[dict]] = [None] * len(items)
        hop = int(self.hp["hop_size"])
        for (s_b, t_b), idxs in sorted(groups.items()):
            for chunk, mb in self._chunks(idxs, t_b):
                rows = chunk + [chunk[0]] * (mb - len(chunk))
                txt = np.stack([_pad_to(items[i][tok_field], s_b)
                                for i in rows])
                mels = np.stack([_pad_to(items[i]["mel"], t_b) for i in rows])
                m2p = np.stack([_pad_to(items[i]["mel2ph"], t_b)
                                for i in rows])
                tm = np.stack([_pad_to(tms[i], t_b) for i in rows])
                f0 = np.stack([_pad_to(items[i]["f0"], t_b) for i in rows])
                uv = np.stack([_pad_to(items[i]["uv"], t_b) for i in rows])
                mel_out = self.infer._model_mel_out_batch(
                    txt, mels, m2p, tm, spk[rows], f0, uv)
                comp = mel_out * tm + mels * (1 - tm)
                if getattr(self.infer.vocoder, "device_batched", False):
                    wavs = self.infer.vocoder.spec2wav_batch(comp)
                else:
                    wavs = self.infer.vocoder.spec2wav_batch(
                        comp[:len(chunk)])
                for r, i in enumerate(chunk):
                    t_i = len(items[i]["mel"])
                    results[i] = {
                        "mel_out": comp[r, :t_i],
                        "wav_out": np.asarray(wavs[r][:t_i * hop]),
                        "t_frames": t_i,
                        "time_mel_masks": tms[i],
                        "ref_mels": items[i]["mel"],
                    }
        return results  # type: ignore[return-value]
