"""Shared test fixtures: tiny hparams and synthetic batches."""

import numpy as np

TINY_HP = {
    # sizes
    "hidden_size": 32,
    "audio_num_mel_bins": 80,
    "audio_sample_rate": 22050,
    "hop_size": 256,
    "fft_size": 1024,
    "win_size": 1024,
    "fmin": 55,
    "fmax": 7600,
    # encoder/decoder
    "encoder_type": "conv",
    "decoder_type": "conv",
    "enc_layers": 2,
    "dec_layers": 2,
    "enc_ffn_kernel_size": 5,
    "dec_ffn_kernel_size": 9,
    "enc_dilations": [1, 1],
    "dec_dilations": [1, 1],
    "enc_kernel_size": 5,
    "dec_kernel_size": 5,
    "enc_post_net_kernel": 3,
    "dec_post_net_kernel": 3,
    "layers_in_block": 2,
    "enc_dec_norm": "ln",
    "num_heads": 2,
    "dropout": 0.0,
    # predictors
    "predictor_hidden": -1,
    "dur_predictor_layers": 2,
    "dur_predictor_kernel": 3,
    "predictor_kernel": 5,
    "predictor_dropout": 0.0,
    "predictor_grad": 0.1,
    "use_pitch_embed": True,
    "use_spk_embed": True,
    "use_spk_id": False,
    "use_uv": True,
    "pitch_type": "frame",
    "frames_multiple": 1,
    # diffusion
    "timesteps": 4,
    "timescale": 1,
    "schedule_type": "vpsde",
    "residual_layers": 2,
    "residual_channels": 16,
    "dilation_cycle_length": 1,
    "diff_loss_type": "l1",
    "keep_bins": 80,
    # losses
    "mel_losses": "l1:0.5|ssim:0.5",
    "lambda_ph_dur": 0.1,
    "lambda_word_dur": 1.0,
    "lambda_sent_dur": 0.0,
    "lambda_f0": 1.0,
    "lambda_uv": 1.0,
    "dur_level": "word" ,
    # training
    "lr": 2e-4,
    "optimizer_adam_beta1": 0.9,
    "optimizer_adam_beta2": 0.98,
    "weight_decay": 0,
    "warmup_updates": 10,
    "scheduler": "warmup",
    "clip_grad_norm": 1.0,
    "accumulate_grad_batches": 1,
    "max_frames": 96,
    "max_input_tokens": 20,
    "lstm_hidden": 64,
}

VOCAB = 12


def synth_corpus_items(rng, n_items=8, n_mels=80, t_max=80, s_max=10):
    """Synthetic binarized items matching the reference binarizer's schema
    (mel, ph_token, mel2ph, f0, pitch, spk_embed, wav_fn, item_name, txt)."""
    items = []
    for i in range(n_items):
        t_len = int(rng.randint(t_max // 2, t_max))
        s = int(rng.randint(4, s_max))
        ph_token = rng.randint(3, VOCAB, s).astype(np.int64)
        bounds = np.sort(rng.choice(np.arange(1, t_len), s - 1, replace=False))
        bounds = np.concatenate([[0], bounds, [t_len]])
        mel2ph = np.zeros(t_len, np.int64)
        for j in range(s):
            mel2ph[bounds[j]:bounds[j + 1]] = j + 1
        f0 = rng.uniform(80, 300, t_len) * (rng.rand(t_len) > 0.2)
        ph2word = (np.arange(s) // 2 + 1).astype(np.int64)  # 2 phones/word
        n_words = int(ph2word.max())
        mel2word = np.where(mel2ph > 0, (mel2ph - 1) // 2 + 1, 0)
        items.append({
            "item_name": f"item_{i}",
            "txt": "synthetic text",
            "ph_token": ph_token,
            "mel": (rng.randn(t_len, n_mels) * 0.5 - 2).astype(np.float32),
            "mel2ph": mel2ph,
            "ph2word": ph2word,
            "word_token": rng.randint(3, VOCAB, n_words).astype(np.int64),
            "mel2word": mel2word.astype(np.int64),
            "f0": f0.astype(np.float32),
            "pitch": rng.randint(0, 256, t_len).astype(np.int64),
            "spk_embed": rng.randn(256).astype(np.float32),
            "spk_id": 0,
            "wav_fn": f"/tmp/item_{i}.wav",
        })
    return items


def write_synth_corpus(data_dir, rng, n_items=8, prefixes=("train", "valid", "test")):
    """Write a tiny binary corpus (IndexedDataset + lengths.npy per split)."""
    import os
    from speech_editing_tpu.data.indexed_dataset import IndexedDatasetBuilder

    os.makedirs(data_dir, exist_ok=True)
    all_items = {}
    for prefix in prefixes:
        items = synth_corpus_items(rng, n_items)
        builder = IndexedDatasetBuilder(f"{data_dir}/{prefix}")
        for it in items:
            builder.add_item(it)
        builder.finalize()
        np.save(f"{data_dir}/{prefix}_lengths.npy",
                np.asarray([len(it["mel"]) for it in items]))
        all_items[prefix] = items
    return all_items


def synth_batch(rng, B=2, S=8, T=64, n_mels=80):
    txt_tokens = np.zeros((B, S), np.int32)
    mel2ph = np.zeros((B, T), np.int32)
    f0 = np.zeros((B, T), np.float32)
    uv = np.zeros((B, T), np.float32)
    mels = np.zeros((B, T, n_mels), np.float32)
    masks = np.zeros((B, T), np.float32)
    lens = []
    for b in range(B):
        s = S - b  # varying token count
        txt_tokens[b, :s] = rng.randint(3, VOCAB, s)
        # random monotonic alignment covering t frames
        t_len = T - 8 * b
        bounds = np.sort(rng.choice(np.arange(1, t_len), s - 1, replace=False))
        bounds = np.concatenate([[0], bounds, [t_len]])
        for i in range(s):
            mel2ph[b, bounds[i]:bounds[i + 1]] = i + 1
        f0[b, :t_len] = rng.uniform(5.5, 8.0, t_len)  # log2 domain
        uv[b, :t_len] = (rng.rand(t_len) < 0.2).astype(np.float32)
        f0[b, :t_len] *= (1 - uv[b, :t_len])
        mels[b, :t_len] = rng.randn(t_len, n_mels) * 0.5 - 2
        m0 = t_len // 4
        masks[b, m0: m0 + t_len // 3] = 1.0
        lens.append(t_len)
    spk_embed = rng.randn(B, 256).astype(np.float32)
    return {
        "txt_tokens": txt_tokens, "mel2ph": mel2ph, "f0": f0, "uv": uv,
        "mels": mels, "time_mel_masks": masks,  # [B,T] (collate schema)
        "spk_embed": spk_embed,
        "mel_lengths": np.array(lens, np.int32),
        "txt_lengths": (txt_tokens != 0).sum(1).astype(np.int32),
        # CWT pitch targets (FS2-orig cwt mode)
        "cwt_spec": rng.randn(B, T, 10).astype(np.float32),
        "f0_mean": rng.uniform(4.5, 5.5, B).astype(np.float32),
        "f0_std": rng.uniform(0.1, 0.4, B).astype(np.float32),
    }


TINY_VOC_HP = {
    # tiny HiFi-GAN config shared by the in-process GAN trainer test and
    # the 2-process distributed GAN test
    "audio_sample_rate": 22050, "audio_num_mel_bins": 80, "hop_size": 64,
    "fft_size": 256, "win_size": 256, "fmin": 55, "fmax": 7600,
    "resblock": "2", "upsample_rates": [4, 4, 4],
    "upsample_kernel_sizes": [8, 8, 8], "upsample_initial_channel": 16,
    "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
    "lr": 2e-4, "adam_b1": 0.8, "adam_b2": 0.99, "lr_decay": 0.999,
    "scheduler_step_size": 600, "lambda_mel": 45.0, "lambda_adv": 1.0,
    "use_fm_loss": True, "use_ms_stft": True, "max_samples": 2048,
    "seed": 1, "sort_by_len": True, "vocab_size": 10,
}


def write_voc_corpus(data_dir, rng, n_items=6, hop=64):
    """Tiny mel+wav IndexedDataset corpus for vocoder (GAN) training."""
    import os

    from speech_editing_tpu.data.indexed_dataset import IndexedDatasetBuilder

    os.makedirs(data_dir, exist_ok=True)
    for prefix in ("train", "valid", "test"):
        b = IndexedDatasetBuilder(f"{data_dir}/{prefix}")
        lens = []
        for i in range(n_items):
            t = int(rng.randint(48, 96))
            mel = (rng.randn(t, 80) * 0.5 - 2).astype(np.float32)
            wav = (rng.randn(t * hop) * 0.1).astype(np.float32)
            b.add_item({"item_name": f"v{i}", "mel": mel, "wav": wav,
                        "pitch": np.zeros(t, np.int64),
                        "f0": np.zeros(t, np.float32)})
            lens.append(t)
        b.finalize()
        np.save(f"{data_dir}/{prefix}_lengths.npy", np.asarray(lens))


def perturb_biases(params, seed=0, scale=0.05):
    """Add noise to every floating rank<=1 param leaf (conv/dense biases,
    LayerNorm scale/offset, pos-embed alphas), leaving kernels untouched.

    Random-init flax params have all-zero biases, under which ``norm(0)=0``
    and padded frames stay exactly zero through conv/norm stacks — padding-
    inertness tests would pass trivially and could not detect leaks that
    only manifest with trained (nonzero-bias) weights. Perturbing the
    1-D leaves reproduces the trained-weight condition."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params)
    rs = np.random.RandomState(seed)
    out = []
    for leaf in leaves:
        arr = np.asarray(leaf)
        if arr.ndim <= 1 and np.issubdtype(arr.dtype, np.floating):
            arr = arr + rs.randn(*arr.shape).astype(arr.dtype) * scale
        out.append(arr)
    return jax.tree_util.tree_unflatten(treedef, out)


def make_spec_denoiser_serve_env(tmp) -> dict:
    """Tiny trained-from-init spec_denoiser checkpoint + phone_set covering
    the g2p output of the serving-test sentences; returns the hp dict
    (shared by tests/test_serving.py and tests/test_serving_online.py)."""
    import json
    import os

    import jax

    from speech_editing_tpu.training.checkpoint import save_checkpoint
    from speech_editing_tpu.training.optim import build_optimizer
    from speech_editing_tpu.training.tasks.spec_denoiser import \
        SpecDenoiserTask
    from speech_editing_tpu.training.train_state import TrainState
    from speech_editing_tpu.utils.text.processors import (get_txt_processor_cls,
                                                          txt_to_ph)

    data_dir = str(tmp / "binary")
    work_dir = str(tmp / "work")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(work_dir, exist_ok=True)

    tp = get_txt_processor_cls("en")
    texts = ["this is a test sentence", "this is a wonderful test sentence",
             "this is a different test sentence",
             "this is a very long wonderful test sentence indeed"]
    phones = set()
    for t in texts:
        ph, *_ = txt_to_ph(tp, t)
        phones.update(ph.split(" "))
    json.dump(sorted(phones), open(f"{data_dir}/phone_set.json", "w"))

    hp = dict(TINY_HP)
    hp.update(binary_data_dir=data_dir, work_dir=work_dir, infer=True,
              use_spk_embed=True, f0_min=80, f0_max=600, language="en",
              vocoder="GriffinLim", seed=1234)
    task = SpecDenoiserTask(hp)
    model = task.build_model()
    rng = np.random.RandomState(0)
    t_frames, s_tok = 64, 10
    batch = {
        "txt_tokens": rng.randint(3, task.vocab_size, (1, s_tok)),
        "time_mel_masks": np.zeros((1, t_frames), np.float32),
        "mel2ph": np.clip(np.sort(rng.randint(1, s_tok, (1, t_frames))),
                          1, s_tok),
        "mels": rng.randn(1, t_frames, 80).astype(np.float32),
        "f0": rng.rand(1, t_frames).astype(np.float32),
        "uv": np.zeros((1, t_frames), np.float32),
        "spk_embed": np.zeros((1, 256), np.float32),
    }
    variables = task.init_model(model, batch, jax.random.PRNGKey(0))
    tx = build_optimizer(hp)
    # nonzero biases/LN offsets: at flax init every bias is zero, under
    # which padded frames stay exactly zero through conv/norm stacks and
    # padding-inertness assertions would pass trivially
    state = TrainState.create(perturb_biases(variables["params"]), tx)
    save_checkpoint(work_dir, state, steps=1)
    return hp


def stub_reference_deps():
    """Insert no-op stand-ins for the reference repo's missing audio deps
    (librosa/pyloudnorm/webrtcvad/skimage) so its torch model modules can be
    imported in this environment for conversion-parity tests. The stubs are
    import-time only — the parity tests never call into them."""
    import sys
    import types

    for name in ("librosa", "librosa.filters", "pyloudnorm", "webrtcvad",
                 "skimage", "skimage.transform", "textgrid", "parselmouth",
                 "pycwt", "pyworld"):
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            if name == "skimage.transform":
                mod.resize = None
            if name == "librosa":
                mod.filters = types.ModuleType("librosa.filters")
            if name == "textgrid":
                mod.TextGrid = type("TextGrid", (), {})
            sys.modules[name] = mod
