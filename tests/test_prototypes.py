"""Prototype ops vs. a torch mirror of the reference math.

The torch expressions below restate the reference model equations
(networks/baseline.py:105-149, networks/pemp_stage1.py:201-215) so the jnp
implementations can be checked numerically on CPU.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pemp_tpu.ops import (
    masked_average_pooling,
    cosine_similarity,
    prototype_predictions,
    meta_prototype_assign,
)


def test_masked_average_pooling():
    rng = np.random.RandomState(0)
    fts = rng.randn(2, 3, 30, 8).astype(np.float32)
    mask = (rng.rand(2, 3, 30) > 0.5).astype(np.float32)
    got = np.asarray(masked_average_pooling(jnp.asarray(fts), jnp.asarray(mask)))
    t_f, t_m = torch.from_numpy(fts), torch.from_numpy(mask)
    want = (t_f * t_m[..., None]).sum(dim=2) / (t_m.sum(dim=2)[..., None] + 1e-5)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)


def test_cosine_similarity_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 40, 16).astype(np.float32)
    y = rng.randn(2, 5, 16).astype(np.float32)
    got = np.asarray(cosine_similarity(jnp.asarray(x), jnp.asarray(y)))
    want = F.cosine_similarity(
        torch.from_numpy(x)[:, :, None, :],
        torch.from_numpy(y)[:, None, :, :], dim=-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # zero vector edge case (torch clamps the norm product at eps)
    x[0, 0] = 0.0
    got = np.asarray(cosine_similarity(jnp.asarray(x), jnp.asarray(y)))
    want = F.cosine_similarity(
        torch.from_numpy(x)[:, :, None, :],
        torch.from_numpy(y)[:, None, :, :], dim=-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _torch_mpm(sup_fts, sup_fg, sup_bg, ctr, protos):
    """Torch restatement of the reference mpm (pemp_stage1.py:195-215),
    NCHW flattened layout [BS, c, hw]."""
    B, S, n, c = sup_fts.shape
    f = torch.from_numpy(sup_fts).permute(0, 1, 3, 2).reshape(B * S, c, n)
    fg = torch.from_numpy(sup_fg).reshape(B * S, 1, n)
    bg = torch.from_numpy(sup_bg).reshape(B * S, 1, n)
    ctr_t = torch.from_numpy(ctr).view(1, c, protos * 2)

    mask = torch.stack((fg, bg), dim=1)                               # [BS,2,1,n]
    D = -((f.unsqueeze(2) - ctr_t.unsqueeze(3)) ** 2).sum(dim=1)      # [BS,2p,n]
    D = D.view(-1, 2, protos, n)
    D = (torch.softmax(D, dim=2) * mask).view(-1, 1, protos * 2, n)
    masked_fts = f.view(-1, c, 1, n) * D                              # [BS,c,2p,n]
    ctr_o = (masked_fts.sum(dim=3) / (D.sum(dim=3) + 1e-6)).view(B, S, c, 2, protos)
    ctr_o = ctr_o.transpose(3, 4).reshape(B, S, c * protos, 2).mean(dim=1)
    fg_p, bg_p = ctr_o.view(B, c, protos, 2).unbind(dim=3)            # [B,c,p]
    return fg_p.permute(0, 2, 1).numpy(), bg_p.permute(0, 2, 1).numpy()


def test_meta_prototype_assign_matches_reference_math():
    rng = np.random.RandomState(2)
    B, S, n, c, p = 2, 2, 25, 12, 3
    sup_fts = rng.randn(B, S, n, c).astype(np.float32)
    sup_fg = (rng.rand(B, S, n) > 0.6).astype(np.float32)
    sup_bg = 1.0 - sup_fg
    ctr = rng.rand(c, 2 * p).astype(np.float32)

    fg_got, bg_got = meta_prototype_assign(
        jnp.asarray(sup_fts), jnp.asarray(sup_fg), jnp.asarray(sup_bg),
        jnp.asarray(ctr), protos=p)
    fg_want, bg_want = _torch_mpm(sup_fts, sup_fg, sup_bg, ctr, p)
    np.testing.assert_allclose(np.asarray(fg_got), fg_want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bg_got), bg_want, rtol=1e-4, atol=1e-5)


def test_prototype_predictions_multi_max():
    rng = np.random.RandomState(3)
    B, Q, n, c, p = 2, 1, 30, 12, 3
    qry = rng.randn(B, Q, n, c).astype(np.float32)
    fg = rng.randn(B, p, c).astype(np.float32)
    bg = rng.randn(B, p, c).astype(np.float32)
    logits, ind = prototype_predictions(
        jnp.asarray(qry), jnp.asarray(fg), jnp.asarray(bg),
        dist_scalar=20.0, return_indices=True)

    tq = torch.from_numpy(qry).view(B * Q, n, 1, c)
    tf = torch.from_numpy(fg).view(B, 1, p, c)
    tb = torch.from_numpy(bg).view(B, 1, p, c)
    fg_sim = F.cosine_similarity(tq, tf, dim=-1) * 20.0   # [BQ, n, p]
    bg_sim = F.cosine_similarity(tq, tb, dim=-1) * 20.0
    sims = torch.stack((bg_sim, fg_sim), dim=2)           # [BQ, n, 2, p]
    want, want_ind = sims.max(dim=-1)
    np.testing.assert_allclose(
        np.asarray(logits).reshape(B * Q, n, 2), want.numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(ind).reshape(B * Q, n, 2), want_ind.numpy())


def test_masked_pooling_adjoint_equals_upsample_then_pool():
    """The adjoint form (down-project the mask through the resize
    matrices) must reproduce the reference's upsample-then-pool
    (networks/baseline.py:100-110) to f32-reassociation accuracy."""
    from pemp_tpu.ops.prototypes import (
        masked_average_pooling, masked_average_pooling_adjoint,
    )
    from pemp_tpu.ops.resize import resize_bilinear_align_corners

    rng = np.random.RandomState(4)
    b, s, h, w, c, H, W = 2, 2, 7, 9, 16, 41, 57
    fts = jnp.asarray(rng.randn(b, s, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, s, H, W) > 0.6).astype(np.float32))

    up = resize_bilinear_align_corners(
        fts.reshape(b * s, h, w, c), (H, W)).reshape(b, s, H * W, c)
    want = masked_average_pooling(up, mask.reshape(b, s, H * W))
    got = masked_average_pooling_adjoint(fts, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # empty mask: the POOL_EPS denominator keeps it finite and equal
    zmask = jnp.zeros((b, s, H, W), jnp.float32)
    zup = masked_average_pooling(up, zmask.reshape(b, s, H * W))
    zadj = masked_average_pooling_adjoint(fts, zmask)
    np.testing.assert_allclose(np.asarray(zadj), np.asarray(zup),
                               rtol=1e-5, atol=1e-7)
