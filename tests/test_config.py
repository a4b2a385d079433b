import os

from speech_editing_tpu.config.hparams import HParams, apply_overrides, load_config, set_hparams


def test_base_config_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nb: {x: 1, y: 2}\nc: base\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"base_config: {base}\nb: {{x: 9}}\nd: 4\n")
    cfg = load_config(str(child))
    assert cfg["a"] == 1 and cfg["d"] == 4 and cfg["c"] == "base"
    assert cfg["b"]["x"] == 9 and cfg["b"]["y"] == 2


def test_overrides_parsing():
    cfg = {"lr": 1.0, "nested": {"k": 0}}
    apply_overrides(cfg, "lr=0.5,nested.k=3,flag=true,lst=[1 2 3],name=abc")
    assert cfg["lr"] == 0.5
    assert cfg["nested"]["k"] == 3
    assert cfg["flag"] is True
    assert cfg["lst"] == [1, 2, 3]
    assert cfg["name"] == "abc"


def test_set_hparams_persists_workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfgf = tmp_path / "exp.yaml"
    cfgf.write_text("lr: 0.1\nhidden_size: 8\n")
    hp = set_hparams(str(cfgf), exp_name="unit", print_hparams=False, argv=[])
    assert isinstance(hp, HParams)
    assert hp["lr"] == 0.1
    assert os.path.exists(tmp_path / "checkpoints/unit/config.yaml")
    # saved config is merged back on second call (without reset)
    cfgf.write_text("lr: 0.9\nhidden_size: 8\n")
    hp2 = set_hparams(str(cfgf), exp_name="unit", print_hparams=False, argv=[])
    assert hp2["lr"] == 0.1  # saved workdir config wins


def test_hparams_immutable():
    hp = HParams({"a": 1})
    try:
        hp.a = 2
        raised = False
    except TypeError:
        raised = True
    assert raised
    assert hp.replace(a=2)["a"] == 2


def test_hparams_pickle_and_hash():
    """HParams must survive pickling (spawn-context pools) and keep the
    documented identity hash despite Mapping's __hash__ = None."""
    import copy
    import pickle

    from speech_editing_tpu.config.hparams import HParams

    hp = HParams({"a": 1, "nested": {"b": [1, 2]}})
    hp2 = pickle.loads(pickle.dumps(hp))
    assert dict(hp2) == dict(hp)
    hp3 = copy.deepcopy(hp)
    assert dict(hp3) == dict(hp)
    assert isinstance(hash(hp), int)
