"""Config tree + CLI override surface."""

import pytest

from pemp_tpu.config import Config, Experiment, apply_overrides, flatten_config
from pemp_tpu.models import registry


def make_cfg():
    cfg = Config()
    cfg.net = registry.net_config("pemp_stage1")
    return cfg


def test_dotted_overrides_with_coercion():
    cfg = make_cfg()
    apply_overrides(cfg, {
        "split": "2", "tr.lr": "0.01", "net.protos": "5",
        "data.dataset": "SYNTH", "tr.sgd_nesterov": "True",
        "tr.lr_boundaries": "[10,20]",
    })
    assert cfg.split == 2 and isinstance(cfg.split, int)
    assert cfg.tr.lr == 0.01
    assert cfg.net.protos == 5
    assert cfg.tr.sgd_nesterov is True
    assert cfg.tr.lr_boundaries == [10, 20]


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        apply_overrides(make_cfg(), {"net.bogus": 1})
    with pytest.raises(KeyError):
        apply_overrides(make_cfg(), {"nosuch.scope": 1})


def test_flatten_has_scopes():
    flat = flatten_config(make_cfg())
    for key in ("tag", "g.model_dir", "data.bs", "tr.lr", "te.epochs",
                "net.protos", "tpu.precision"):
        assert key in flat, key


def test_experiment_requires_split(tmp_path):
    cfg = make_cfg()
    cfg.g.model_dir = str(tmp_path)
    ex = Experiment("t", cfg)
    with pytest.raises(ValueError):
        ex.assemble("train", {})
    cfg2, run = ex.assemble("train", {"split": "1"})
    assert cfg2.split == 1
    assert run._id == 1
    assert (tmp_path / cfg2.tag / "1" / "config.json").exists()
    # run ids increment
    _, run2 = ex.assemble("train", {"split": "1"})
    assert run2._id == 2


def test_unobserved_run_has_no_id(tmp_path):
    cfg = make_cfg()
    cfg.g.model_dir = str(tmp_path)
    ex = Experiment("t", cfg)
    _, run = ex.assemble("train", {"split": "0"}, observed=False)
    assert run._id is None


def test_bool_override_rejects_unparseable_strings():
    """bool('off') is True — unparseable boolean strings must raise,
    not silently invert the user's intent."""
    import pytest
    from pemp_tpu.config import Config
    from pemp_tpu.config.base import apply_overrides

    cfg = apply_overrides(Config(), {"tpu.use_pallas": "off"})
    assert cfg.tpu.use_pallas is False
    cfg = apply_overrides(Config(), {"tpu.use_pallas": "ON"})
    assert cfg.tpu.use_pallas is True
    for v in ("True", "false", "1", "0", "yes", "no"):
        apply_overrides(Config(), {"tpu.use_pallas": v})
    with pytest.raises(ValueError):
        apply_overrides(Config(), {"tpu.use_pallas": "maybe"})


def test_resume_without_exp_id_raises(tmp_path):
    """ADVICE r2: resume=True with exp_id unset must fail loudly instead
    of silently training from scratch in a fresh run dir."""
    cfg = make_cfg()
    cfg.g.model_dir = str(tmp_path)
    ex = Experiment("t", cfg)
    with pytest.raises(ValueError, match="resume"):
        ex.assemble("train", {"split": "1", "resume": "True"})


def test_print_config_flag_prints_then_runs(tmp_path, capsys):
    """Sacred grammar parity: `-p` prints the assembled config and the
    command still executes (reference README advertises `[-u] [-p]` on
    every script)."""
    cfg = make_cfg()
    cfg.g.model_dir = str(tmp_path)
    ex = Experiment("t", cfg)
    ran = []

    @ex.command("probe")
    def probe(cfg, run):
        ran.append(cfg.split)

    ex.run_commandline(["probe", "with", "split=2", "-p", "-u"])
    out = capsys.readouterr().out
    assert "split" in out and "data" in out   # config dump happened
    assert ran == [2]                         # ... and the command ran

    ran.clear()
    ex.run_commandline(["probe", "with", "split=1", "-u"])
    assert "split" not in capsys.readouterr().out
    assert ran == [1]


def test_assemble_gates_recording_to_rank0(tmp_path, monkeypatch):
    """Direct assemble() callers in a multi-process world must not race
    rank 0 for the run id: when a NON-recording rank wins the mkdir the
    run dir has no ckpt.msgpack and a later resume=True exp_id=N
    silently restarts from scratch (found live by
    test_distributed_2proc.py::test_two_process_resume under load)."""
    import jax

    cfg = make_cfg()
    cfg.g.model_dir = str(tmp_path)
    ex = Experiment("t", cfg)

    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    _, run = ex.assemble("train", {"split": "0", "tag": "t"})
    assert run._id is None                      # rank 1: unobserved
    assert not (tmp_path / "t").exists()        # ... and no dir allocated

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    _, run = ex.assemble("train", {"split": "0", "tag": "t"})
    assert run._id == 1                         # rank 0 records as usual
    assert (tmp_path / "t" / "1").is_dir()
