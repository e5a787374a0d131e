"""Loss semantics vs torch (ignore-index CE, cedt normalization)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pemp_tpu.core import losses


def test_ce_matches_torch_with_ignore():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 9, 11, 2).astype(np.float32)
    labels = rng.randint(0, 2, (2, 9, 11)).astype(np.int32)
    labels[0, :3] = 255
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels.astype(np.int64)), ignore_index=255).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ce_no_ignore_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 5, 7, 2).astype(np.float32)
    labels = rng.randint(0, 2, (2, 5, 7)).astype(np.int32)
    got = float(losses.cross_entropy_no_ignore(
        jnp.asarray(logits), jnp.asarray(labels)))
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels.astype(np.int64))).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cedt_matches_reference_pipeline():
    """cedt = sum(pixel_ce * weight) / sum(weight) with the scipy-EDT
    weight (reference core/losses.py:33-43), EDT on-device here."""
    from scipy.ndimage import distance_transform_edt

    rng = np.random.RandomState(2)
    logits = rng.randn(1, 41, 41, 2).astype(np.float32)
    labels = np.zeros((1, 41, 41), np.int32)
    labels[0, 10:30, 8:25] = 1
    sigma = 5.0
    got = float(losses.cedt(jnp.asarray(logits), jnp.asarray(labels), sigma))

    # reference recipe in torch/scipy
    tl = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tt = torch.from_numpy(labels.astype(np.int64))
    pix = F.cross_entropy(tl, tt, ignore_index=255, reduction="none")
    mask = (tt == 1).float()[:, None]
    kernel = torch.ones(1, 1, 3, 3)
    s = F.conv2d(mask, kernel, padding=1)
    boundary = (torch.clamp(s, 0, 1) - mask + mask
                - torch.clamp(s - 8, 0, 1)).squeeze(1).numpy()
    bb = np.around(boundary).astype(bool)
    edt = np.stack([distance_transform_edt(~b) for b in bb])
    weight = np.exp(-edt / sigma ** 2) + 1
    want = float((pix.numpy() * weight).sum() / weight.sum())
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_rpmms_and_pfenet_loss_shapes():
    rng = np.random.RandomState(3)
    outs = [jnp.asarray(rng.randn(2, 1, 9, 9, 2).astype(np.float32))
            for _ in range(3)]
    labels = jnp.asarray(rng.randint(0, 2, (2, 9, 9)).astype(np.int32))
    total, p2, p1 = losses.rpmms_loss(outs, labels)
    assert total.shape == () and np.isfinite(float(total))
    aux = losses.pfenet_aux_loss(tuple(outs), labels)
    assert aux.shape == () and np.isfinite(float(aux))


def test_loss_factory():
    class Cfg:
        loss = "ce"
        sigma = 5.0
    assert losses.get(Cfg()) is losses.cross_entropy
    Cfg.loss = "cedt"
    assert callable(losses.get(Cfg()))
    Cfg.loss = "bogus"
    try:
        losses.get(Cfg())
        assert False
    except ValueError:
        pass


def test_per_episode_ce_averages_per_query_with_uneven_voids():
    """The on-device eval CE must equal the host path's semantics: one
    CE per query (each normalized by its own valid-pixel count), then
    the episode mean — NOT a pool of all queries' pixels. The two only
    differ when 255-void pixels are spread unevenly across queries."""
    rng = np.random.RandomState(0)
    b, q, n = 2, 3, 40
    logits = rng.randn(b, q, n, 2).astype(np.float32)
    labels = rng.randint(0, 2, (b, q, n)).astype(np.int32)
    labels[:, 0, :30] = 255                 # query 0 is mostly void
    labels[:, 2, :5] = 255

    got = np.asarray(losses.per_episode_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels)))

    want = []
    for i in range(b):
        per_q = []
        for j in range(q):
            lg = torch.from_numpy(logits[i, j])
            lb = torch.from_numpy(labels[i, j].astype(np.int64))
            per_q.append(F.cross_entropy(lg, lb, ignore_index=255).item())
        want.append(np.mean(per_q))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)

    # and it must NOT equal the pixel-pooled variant on this data
    pooled = []
    for i in range(b):
        lg = torch.from_numpy(logits[i].reshape(-1, 2))
        lb = torch.from_numpy(labels[i].reshape(-1).astype(np.int64))
        pooled.append(F.cross_entropy(lg, lb, ignore_index=255).item())
    assert not np.allclose(got, np.asarray(pooled), rtol=1e-3)
