"""Offline preprocessing: raw corpus -> normalized text/phones + MFA inputs.

Parity surface: ``data_gen/tts/base_preprocess.py`` — dataset meta loaders
for vctk/libritts/stutter_set (:35-80), two-pass pipeline (g2p + wav staging
:99-123, token encoding :126-133), phone/word/spk maps (:203-243), grouped
MFA corpus builder with ``mfa_dict.txt`` (:136-156, :245-260), and
``metadata.json`` output.

Host-side Python throughout (this feeds the binarizer; nothing here touches
the device).
"""

from __future__ import annotations

import json
import os
import random
import re
import shutil
from collections import Counter
from glob import glob
from typing import Iterator, Optional

from speech_editing_tpu.utils.multiprocess import multiprocess_run_tqdm
from speech_editing_tpu.utils.text.processors import (get_txt_processor_cls,
                                                      txt_to_ph)
from speech_editing_tpu.utils.text.text_encoder import (TokenTextEncoder,
                                                        build_token_encoder,
                                                        is_sil_phoneme)


class BasePreprocessor:
    def __init__(self, hp: Optional[dict] = None):
        hp = hp or {}
        self.hp = hp
        self.dataset_name = hp.get("ds_name", "vctk")
        self.raw_data_dir = hp.get("raw_data_dir", f"data/raw/{self.dataset_name}")
        self.processed_dir = hp.get("processed_data_dir",
                                    f"data/processed/{self.dataset_name}")
        self.txt_processor = get_txt_processor_cls(hp.get("language", "en"))
        self.spk_map_fn = f"{self.processed_dir}/spk_map.json"
        self.reset_phone_dict = True
        self.reset_word_dict = True
        self.word_dict_size = hp.get("word_dict_size", 12500)
        self.num_spk = hp.get("num_spk", 1200)
        self.use_mfa = hp.get("use_mfa", True)
        self.seed = hp.get("seed", 1234)
        self.nsample_per_mfa_group = hp.get("nsample_per_mfa_group", 1000)
        self.mfa_group_shuffle = hp.get("mfa_group_shuffle", False)
        self.wav_processed_dirname = "wav_processed"
        self.meta_csv_filename = "metadata"

    # -- dataset meta loaders (reference :35-80) ------------------------------
    def meta_data(self) -> Iterator[dict]:
        if self.dataset_name == "stutter_set":
            tmp_spk_dict = {}
            with open(f"{self.raw_data_dir}/video_spk.txt") as f:
                for line in f:
                    parts = line.split(" ")
                    tmp_spk_dict[parts[0]] = parts[1]
            with open(f"{self.raw_data_dir}/metadata.csv") as f:
                for r in f:
                    wav_fn = r.split("|")[0]
                    item_name = os.path.basename(wav_fn)[:-4]
                    txt = r.split("|")[1].replace("\n", "")
                    spk_name = tmp_spk_dict[item_name[0:13]]
                    yield {"item_name": item_name, "wav_fn": wav_fn,
                           "txt": txt, "spk_name": spk_name}
        elif self.dataset_name == "vctk":
            for wav_fn in sorted(glob(f"{self.raw_data_dir}/wav48/*/*.wav")):
                item_name = os.path.basename(wav_fn)[:-4]
                spk_name = wav_fn.split("/")[-2]
                txt_fn = wav_fn.replace("/wav48/", "/txt/")[:-4] + ".txt"
                if os.path.exists(txt_fn):
                    with open(txt_fn) as f:
                        txt = f.read()
                    yield {"item_name": item_name, "wav_fn": wav_fn,
                           "txt": txt, "spk_name": spk_name}
        elif self.dataset_name == "libritts":
            for wav_fn in sorted(glob(f"{self.raw_data_dir}/*/*/*/*.wav")):
                item_name = os.path.basename(wav_fn)[:-4]
                txt_fn = f"{wav_fn[:-4]}.normalized.txt"
                with open(txt_fn) as f:
                    txt = f.read()
                yield {"item_name": item_name, "wav_fn": wav_fn, "txt": txt,
                       "spk_name": item_name.split("_")[0]}
        else:
            raise NotImplementedError(
                f"ds_name={self.dataset_name}; add a meta_data loader")

    # -- passes ----------------------------------------------------------------
    @classmethod
    def preprocess_first_pass(cls, item_name, txt_raw, txt_processor, wav_fn,
                              wav_processed_dir, wav_processed_tmp,
                              wav_processors=(), **kw):
        try:
            ph, txt, word, ph2word, ph_gb_word = txt_to_ph(txt_processor, txt_raw)
            wav_align_fn = wav_fn
            ext = os.path.splitext(wav_fn)[1]
            os.makedirs(wav_processed_dir, exist_ok=True)
            new_wav_fn = f"{wav_processed_dir}/{item_name}{ext}"
            # stage the (optionally sox-processed) wav
            from speech_editing_tpu.data.wav_processors import run_wav_processors

            processed_fn = run_wav_processors(wav_fn, wav_processed_tmp,
                                              wav_processors)
            if processed_fn != wav_fn:
                shutil.copyfile(processed_fn, new_wav_fn)
            else:
                try:
                    if os.path.lexists(new_wav_fn):
                        os.remove(new_wav_fn)
                    os.link(wav_fn, new_wav_fn)
                except OSError:
                    shutil.copyfile(wav_fn, new_wav_fn)
            return {"txt": txt, "txt_raw": txt_raw, "ph": ph, "word": word,
                    "ph2word": ph2word, "ph_gb_word": ph_gb_word,
                    "wav_fn": new_wav_fn, "wav_align_fn": wav_align_fn}
        except Exception:
            import traceback

            traceback.print_exc()
            print(f"| Error in first pass: {item_name}")
            return None

    @staticmethod
    def preprocess_second_pass(word, ph, spk_name, word_encoder, ph_encoder,
                               spk_map, **kw):
        word_token = word_encoder.encode(word)
        ph_token = ph_encoder.encode(ph)
        spk_id = spk_map[spk_name]
        return {"word_token": word_token, "ph_token": ph_token,
                "spk_id": spk_id}

    # -- vocab/maps --------------------------------------------------------------
    def _phone_encoder(self, ph_set) -> TokenTextEncoder:
        fn = f"{self.processed_dir}/phone_set.json"
        if self.reset_phone_dict or not os.path.exists(fn):
            json.dump(sorted(set(ph_set)), open(fn, "w"), ensure_ascii=False)
        return build_token_encoder(fn)

    def _word_encoder(self, word_set) -> TokenTextEncoder:
        fn = f"{self.processed_dir}/word_set.json"
        if self.reset_word_dict or not os.path.exists(fn):
            counts = Counter(word_set).most_common(self.word_dict_size)
            json.dump(sorted([w for w, _ in counts]), open(fn, "w"),
                      ensure_ascii=False)
        return build_token_encoder(fn)

    def build_spk_map(self, spk_names) -> dict:
        spk_map = {name: i for i, name in enumerate(sorted(spk_names))}
        assert len(spk_map) <= max(self.num_spk, len(spk_map))
        json.dump(spk_map, open(self.spk_map_fn, "w"), ensure_ascii=False)
        return spk_map

    def load_spk_map(self, base_dir) -> dict:
        return json.load(open(f"{base_dir}/spk_map.json"))

    def load_dict(self, base_dir):
        return (build_token_encoder(f"{base_dir}/phone_set.json"),
                build_token_encoder(f"{base_dir}/word_set.json"))

    # -- MFA corpus ----------------------------------------------------------------
    @classmethod
    def build_mfa_inputs(cls, item, mfa_input_dir, mfa_group,
                         wav_processed_tmp, **kw):
        item_name = item["item_name"]
        wav_align_fn = item["wav_align_fn"]
        ph_gb_word = item["ph_gb_word"]
        group_dir = f"{mfa_input_dir}/{mfa_group}"
        os.makedirs(group_dir, exist_ok=True)
        ph_gb_word_nosil = " ".join(
            ["_".join([p for p in w.split("_") if not is_sil_phoneme(p)])
             for w in ph_gb_word.split(" ") if not is_sil_phoneme(w)])
        ext = os.path.splitext(wav_align_fn)[1]
        new_wav_align_fn = f"{group_dir}/{item_name}{ext}"
        shutil.copyfile(wav_align_fn, new_wav_align_fn)
        with open(f"{group_dir}/{item_name}.lab", "w") as f:
            f.write(ph_gb_word_nosil)
        return ph_gb_word_nosil, new_wav_align_fn

    # -- driver ----------------------------------------------------------------
    def process(self):
        processed_dir = self.processed_dir
        wav_processed_tmp = f"{processed_dir}/processed_tmp"
        wav_processed_dir = f"{processed_dir}/{self.wav_processed_dirname}"
        for d in (wav_processed_tmp, wav_processed_dir):
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d, exist_ok=True)

        meta = list(self.meta_data())
        names = [d["item_name"] for d in meta]
        assert len(names) == len(set(names)), "item_name must be unique"

        args = [{"item_name": d["item_name"], "txt_raw": d["txt"],
                 "wav_fn": d["wav_fn"],
                 "txt_processor": self.txt_processor,
                 "wav_processed_dir": wav_processed_dir,
                 "wav_processed_tmp": wav_processed_tmp,
                 "wav_processors": self.hp.get("wav_processors", ())}
                for d in meta]
        items, phone_list, word_list, spk_names = [], [], [], set()
        for (raw, (item_id, out)) in zip(
                meta, multiprocess_run_tqdm(self.preprocess_first_pass, args,
                                            desc="Preprocess")):
            if out is None:
                continue
            item = dict(raw)
            item.update(out)
            item["id"] = item_id
            item["spk_name"] = item.get("spk_name", "<SINGLE_SPK>")
            phone_list += item["ph"].split(" ")
            word_list += item["word"].split(" ")
            spk_names.add(item["spk_name"])
            items.append(item)

        ph_encoder = self._phone_encoder(phone_list)
        word_encoder = self._word_encoder(word_list)
        spk_map = self.build_spk_map(spk_names)
        args = [{"ph": it["ph"], "word": it["word"], "spk_name": it["spk_name"],
                 "word_encoder": word_encoder, "ph_encoder": ph_encoder,
                 "spk_map": spk_map} for it in items]
        for idx, kv in multiprocess_run_tqdm(self.preprocess_second_pass, args,
                                             desc="Encode tokens"):
            items[idx].update(kv)

        if self.use_mfa:
            mfa_dict = set()
            mfa_input_dir = f"{processed_dir}/mfa_inputs"
            shutil.rmtree(mfa_input_dir, ignore_errors=True)
            groups = [i // self.nsample_per_mfa_group for i in range(len(items))]
            if self.mfa_group_shuffle:
                random.seed(self.seed)
                random.shuffle(groups)
            args = [{"item": it, "mfa_input_dir": mfa_input_dir,
                     "mfa_group": g, "wav_processed_tmp": wav_processed_tmp}
                    for it, g in zip(items, groups)]
            for i, out in multiprocess_run_tqdm(self.build_mfa_inputs, args,
                                                desc="Build MFA data"):
                if out is None:
                    continue
                ph_gb_word_nosil, new_fn = out
                items[i]["wav_align_fn"] = new_fn
                for w in ph_gb_word_nosil.split(" "):
                    mfa_dict.add(f"{w} {w.replace('_', ' ')}")
            with open(f"{processed_dir}/mfa_dict.txt", "w") as f:
                f.writelines([f"{l}\n" for l in sorted(mfa_dict)])

        with open(f"{processed_dir}/{self.meta_csv_filename}.json", "w") as f:
            f.write(re.sub(r"\n\s+([\d+\]])", r"\1",
                           json.dumps(items, ensure_ascii=False,
                                      sort_keys=False, indent=1)))
        shutil.rmtree(wav_processed_tmp, ignore_errors=True)
        print(f"| preprocessed {len(items)} items -> {processed_dir}")
        return items


if __name__ == "__main__":
    from speech_editing_tpu.config.hparams import set_hparams

    hp = set_hparams(print_hparams=False)
    BasePreprocessor(dict(hp)).process()
