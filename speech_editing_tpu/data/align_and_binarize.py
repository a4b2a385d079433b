"""One-command offline data pipeline: preprocess -> MFA align -> binarize.

Parity surface: ``data_gen/tts/runs/align_and_binarize.py`` (the reference
chains preprocess() + binarize(); alignment runs separately via
``run_mfa_train_align.sh``). Here all three stages sit behind one CLI:

    python -m speech_editing_tpu.data.align_and_binarize \
        --config egs/spec_denoiser.yaml [--skip-align] [--mfa-jobs N]

The MFA stage shells out to ``scripts/run_mfa_train_align.sh`` (MFA/Kaldi
stays an external binary, SURVEY §2.9). It is skipped automatically when
``<processed_data_dir>/mfa_outputs`` already holds TextGrids (e.g. produced
on another host or by a pretrained aligner) and ``--skip-align`` forces the
skip; otherwise a missing ``mfa`` binary is a hard error — silently
binarizing without alignments would produce a corpus with no mel2ph.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys


def align_and_binarize(hp: dict, skip_align: bool = False,
                       mfa_jobs: int | None = None):
    from speech_editing_tpu.data.binarizer import BaseBinarizer
    from speech_editing_tpu.data.preprocess import BasePreprocessor

    pre = BasePreprocessor(dict(hp))
    processed_dir = pre.processed_dir
    print(f"| [1/3] preprocess -> {processed_dir}")
    pre.process()

    tg_dir = os.path.join(processed_dir, "mfa_outputs")
    have_tgs = bool(glob.glob(os.path.join(tg_dir, "*.TextGrid")))
    if skip_align or (have_tgs and hp.get("reuse_align", True)):
        why = "--skip-align" if skip_align else f"TextGrids present in {tg_dir}"
        print(f"| [2/3] MFA align skipped ({why})")
    else:
        script = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
            "scripts", "run_mfa_train_align.sh")
        jobs = mfa_jobs or int(os.environ.get("N_PROC", os.cpu_count() or 1))
        print(f"| [2/3] MFA align ({jobs} jobs)")
        subprocess.check_call(["bash", script, processed_dir, str(jobs)])

    print("| [3/3] binarize")
    BaseBinarizer(dict(hp)).process()


def main(argv=None):
    from speech_editing_tpu.config.hparams import set_hparams

    ap = argparse.ArgumentParser(
        description="preprocess -> MFA align -> binarize in one command")
    ap.add_argument("--skip-align", action="store_true",
                    help="binarize with pre-existing TextGrids only")
    ap.add_argument("--mfa-jobs", type=int, default=None)
    args, rest = ap.parse_known_args(argv)
    sys.argv = [sys.argv[0]] + rest  # remaining flags go to set_hparams
    hp = set_hparams(print_hparams=False)
    align_and_binarize(dict(hp), skip_align=args.skip_align,
                       mfa_jobs=args.mfa_jobs)


if __name__ == "__main__":
    main()
