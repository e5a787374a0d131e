"""Episode contract + loader behavior (synthetic dataset) and the
checkpoint round trip. Mirrors the reference shape/dtype contract tests
(data_kits/pascal_voc_test.py:24-53), channels-last."""

import numpy as np
import pytest

from pemp_tpu.config import Config
from pemp_tpu.data.loader import EpisodeLoader
from pemp_tpu.data.synthetic import SyntheticDataset
from pemp_tpu.models import registry


def make_cfg(**overrides):
    cfg = Config()
    cfg.net = registry.net_config("baseline")
    cfg.data.dataset = "SYNTH"
    cfg.data.height = cfg.data.width = 33
    cfg.data.train_n = 8
    cfg.data.test_n = 4
    cfg.data.bs = 4
    for k, v in overrides.items():
        setattr(cfg.data, k, v)
    return cfg


def test_train_batch_contract():
    cfg = make_cfg()
    ds = SyntheticDataset(cfg, train=True, split=0, shot=1, query=1)
    ds.sample_tasks()
    loader = EpisodeLoader(ds, 4, num_workers=2, drop_last=True)
    batch = next(iter(loader))
    assert batch["sup_rgb"].shape == (4, 1, 33, 33, 3)
    assert batch["sup_rgb"].dtype == np.float32
    assert batch["sup_mask"].shape == (4, 1, 33, 33, 2)
    np.testing.assert_allclose(
        batch["sup_mask"].sum(-1), 1.0)     # fg + bg == 1
    assert batch["qry_rgb"].shape == (4, 1, 33, 33, 3)
    assert batch["qry_msk"].shape == (4, 1, 33, 33)
    assert batch["qry_msk"].dtype == np.int32
    assert batch["cls"].shape == (4,)
    # train classes exclude the val split
    assert all(c not in range(1, 6) for c in batch["cls"])


def test_test_batch_contract():
    cfg = make_cfg()
    ds = SyntheticDataset(cfg, train=False, split=2, shot=1, query=1)
    ds.sample_tasks()
    loader = EpisodeLoader(ds, 1, num_workers=1)
    batch = next(iter(loader))
    assert batch["sup_rgb"].shape == (1, 1, 33, 33, 3)
    assert all(c in range(11, 16) for c in batch["cls"])


def test_loader_covers_all_episodes_in_order():
    cfg = make_cfg()
    ds = SyntheticDataset(cfg, train=False, split=0, shot=1, query=1)
    ds.sample_tasks()
    loader = EpisodeLoader(ds, 1, num_workers=2)
    classes = [int(b["cls"][0]) for b in loader]
    want = [cls for cls, _ in ds.sampler.tasks]
    assert classes == want
    assert len(loader) == 4


def test_loader_drop_last():
    cfg = make_cfg(test_n=5)
    ds = SyntheticDataset(cfg, train=False, split=0, shot=1, query=1)
    ds.sample_tasks()
    assert len(EpisodeLoader(ds, 2, drop_last=True)) == 2
    assert len(EpisodeLoader(ds, 2, drop_last=False)) == 3


def test_loader_worker_error_propagates():
    cfg = make_cfg()
    ds = SyntheticDataset(cfg, train=False, split=0, shot=1, query=1)
    ds.sample_tasks()

    def boom(idx):
        raise RuntimeError("decode failed")
    ds.get_episode = boom
    with pytest.raises(RuntimeError, match="decode failed"):
        list(EpisodeLoader(ds, 2, num_workers=2))


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from pemp_tpu.core import checkpoint as ckpt

    variables = {"params": {"w": jnp.arange(4.0)},
                 "batch_stats": {"m": jnp.ones(2)}}
    opt_state = {"momentum": jnp.zeros(4)}
    path = tmp_path / "ckpt.msgpack"
    ckpt.save(path, variables, opt_state, epoch=7,
              extra={"best_iou": 0.5})

    target_v = {"params": {"w": jnp.zeros(4)},
                "batch_stats": {"m": jnp.zeros(2)}}
    target_o = {"momentum": jnp.ones(4)}
    v, o, e, extra = ckpt.load(path, target_v, target_o)
    np.testing.assert_array_equal(np.asarray(v["params"]["w"]),
                                  [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(o["momentum"]), np.zeros(4))
    assert e == 7
    assert extra == {"best_iou": 0.5}
    # weights-only restore from the same file
    v2 = ckpt.load_variables(path, target_v)
    np.testing.assert_array_equal(np.asarray(v2["batch_stats"]["m"]),
                                  np.ones(2))


def test_history_store():
    from pemp_tpu.data.history import HistoryStore

    store = HistoryStore(5, 5)
    z = store.get(3, "a", train=False)
    assert z.shape == (5, 5, 2) and (z == 0).all()

    # EPOCH-SNAPSHOT reads (the reference's forked-worker visibility):
    # a write-back is invisible until the next epoch/round resamples
    store.put(3, "a", np.full((5, 5, 2), 0.7, np.float32))
    assert (store.get(3, "a", train=False) == 0).all()
    store.next_epoch()
    np.testing.assert_allclose(store.get(3, "a", train=False), 0.7)

    # train mode: ~30% of loads reset to zeros (distinct load events =
    # distinct episode indices in the epoch's task list)
    zeros = sum((store.get(3, "a", train=True, idx=i) == 0).all()
                for i in range(500))
    assert 100 < zeros < 220, zeros

    # the reset stream is a PURE function of (seed, epoch, episode idx,
    # sample) — independent of thread schedule, load interleaving, and
    # store instance: cross-host agreement by construction (the old
    # per-sample load COUNTER was scheduler-dependent when one sample
    # appeared twice in a concurrently-decoded chunk; python-global-
    # random depended on every other call's order)
    def draws(order):
        s = HistoryStore(5, 5, seed=7)
        for c, n in order:
            s.put(c, n, np.full((5, 5, 2), 0.7, np.float32))
        s.next_epoch()
        out = {}
        for c, n in order:
            for i in range(20):
                out.setdefault((c, n), []).append(
                    bool((s.get(c, n, train=True, idx=i) == 0).all()))
        return out

    a = draws([(1, "x"), (2, "y")])
    b = draws([(2, "y"), (1, "x")])
    assert a == b and any(any(v) for v in a.values())
    # and it varies across epochs for the same (idx, sample)
    s = HistoryStore(5, 5, seed=7)
    per_epoch = [s._reset_draw((1, "x"), e, 0) for e in range(40)]
    assert any(per_epoch) and not all(per_epoch)


def test_history_train_draws_independent_of_eval_rounds():
    """The TRAIN reset-draw stream is keyed by the train adapter's OWN
    resample count: interleaved eval rounds (which resample the shared
    store for snapshot visibility) must not shift it — otherwise a
    resumed run, whose catch-up replays exactly start_epoch train
    resamples (core/trainer.py), would draw a different reset pattern
    than the uninterrupted run."""
    from pemp_tpu.data.history import CaNetDataAdapter, HistoryStore

    class FakeDS:
        ret_name = False

        def sample_tasks(self):
            return None

        def get_episode(self, idx):
            return {"cls": 1, "qry_names": ["q"]}

    def train_draws(eval_rounds_between):
        store = HistoryStore(4, 4, seed=7)
        tr = CaNetDataAdapter(FakeDS(), store, train=True)
        ev = CaNetDataAdapter(FakeDS(), store, train=False)
        store.put(1, "q", np.full((4, 4, 2), 0.5, np.float32))
        out = []
        for _ in range(6):                      # 6 train epochs
            tr.sample_tasks()
            out.extend(bool((tr.get_episode(i)["history"] == 0).all())
                       for i in range(25))
            for _ in range(eval_rounds_between):
                ev.sample_tasks()               # eval rounds resample too
        return out

    a, b = train_draws(0), train_draws(3)
    assert a == b and any(a) and not all(a)
