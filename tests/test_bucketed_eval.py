"""Bucketed variable-size eval (VERDICT round-1 item 4): test_bs>1 with
per-episode padded resize matmuls must reproduce the host-exact path's
metrics bit-for-bit.

The SYNTH dataset's ``data.var_gt`` mode emulates the PASCAL test
protocol (reference data_kits/pascal_voc.py:229): query images at the
input size, query GT at each sample's own original resolution — the
reason the reference hard-requires test_bs=1.
"""

import numpy as np


def test_bucketed_eval_matches_host_exact(tmp_path):
    import entry.baseline as eb

    cfg, run = eb.ex.assemble("train", {
        "split": "0", "data.dataset": "SYNTH", "data.height": "33",
        "data.width": "33", "data.bs": "2", "data.train_n": "4",
        "data.test_n": "2", "te.epochs": "1", "tr.total_epochs": "1",
        "net.backbone": "vgg16", "g.model_dir": str(tmp_path),
    })
    eb.BaselineRuntime(cfg, run).train()

    results = []
    for test_bs in ("3", "1"):
        cfg2, run2 = eb.ex.assemble("test", {
            "split": "0", "data.dataset": "SYNTH", "data.height": "33",
            "data.width": "33", "data.test_n": "7", "te.epochs": "2",
            "data.var_gt": "True", "data.test_bs": test_bs,
            "net.backbone": "vgg16", "exp_id": "1",
            "g.model_dir": str(tmp_path),
        }, observed=False)
        rt = eb.BaselineRuntime(cfg2, run2)
        results.append(rt.test())

    # variable GT sizes really were produced and batched
    from pemp_tpu.data import datasets
    ds, loader, _ = datasets.load(cfg2, "test")
    ds.reset_sampler()
    ds.sample_tasks()
    ep_sizes = {np.asarray(ds.get_episode(i)["qry_msk"]).shape[-2:]
                for i in range(3)}
    assert len(ep_sizes) > 1, "var_gt must vary the GT size"

    m_bucket = results[0].split("mIoU")[1]
    m_host = results[1].split("mIoU")[1]
    assert m_bucket == m_host, results


def test_bucketed_eval_mesh_indivisible_batches(tmp_path):
    """Regression: under a data mesh, bucketed eval's interp-matrix /
    label puts must take the same replicate fallback device_batch applies
    to the wire arrays — test_bs=3 on an 8-device mesh used to crash the
    batch-sharded put ('3 should evenly divide 8'). Metrics must still
    equal the host-exact path."""
    import entry.baseline as eb

    cfg, run = eb.ex.assemble("train", {
        "split": "0", "data.dataset": "SYNTH", "data.height": "33",
        "data.width": "33", "data.bs": "2", "data.train_n": "4",
        "data.test_n": "2", "te.epochs": "1", "tr.total_epochs": "1",
        "net.backbone": "vgg16", "g.model_dir": str(tmp_path),
    })
    eb.BaselineRuntime(cfg, run).train()

    results = []
    for test_bs, mesh in (("3", "8"), ("1", "0")):
        cfg2, run2 = eb.ex.assemble("test", {
            "split": "0", "data.dataset": "SYNTH", "data.height": "33",
            "data.width": "33", "data.test_n": "7", "te.epochs": "1",
            "data.var_gt": "True", "data.test_bs": test_bs,
            "tpu.mesh": mesh, "net.backbone": "vgg16", "exp_id": "1",
            "g.model_dir": str(tmp_path),
        }, observed=False)
        results.append(eb.BaselineRuntime(cfg2, run2).test())

    assert results[0].split("mIoU")[1] == results[1].split("mIoU")[1], \
        results


def test_var_gt_multi_query_episode_stacks():
    """Regression: with query>1, the per-EPISODE GT size (keyed on the
    first query name) must apply to every query so the episode stacks —
    per-query sizes used to crash np.stack at get_episode."""
    from pemp_tpu.config import Config
    from pemp_tpu.data.synthetic import SyntheticDataset
    from pemp_tpu.models import registry

    cfg = Config()
    cfg.net = registry.net_config("baseline")
    cfg.split = 0
    cfg.query = 2
    cfg.data.height = cfg.data.width = 33
    cfg.data.test_n = 3
    cfg.data.var_gt = True
    ds = SyntheticDataset(cfg, train=False, split=0, shot=1, query=2)
    ds.reset_sampler()
    ds.sample_tasks()
    sizes = set()
    for i in range(3):
        q = ds.get_episode(i)["qry_msk"]
        assert q.shape[0] == 2                      # both queries stacked
        sizes.add(q.shape[-2:])
    assert len(sizes) > 1, "GT size must still vary across episodes"
