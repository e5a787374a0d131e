"""RPMMs EM + discriminative probability map parity vs a torch mirror of
the reference PMMs math (networks/rpmms.py:65-141)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pemp_tpu.models.rpmms import pmm_em, pmm_prob_map


def torch_em(x, mu, stage_num=10, kappa=20.0):
    """Reference PMMs.EM (rpmms.py:65-86): x [b, c, n], mu [b, c, k]."""
    with torch.no_grad():
        for _ in range(stage_num):
            z = kappa * torch.bmm(x.permute(0, 2, 1), mu)   # [b, n, k]
            z = F.softmax(z, dim=2)
            z_ = z / (1e-6 + z.sum(dim=1, keepdim=True))
            mu = torch.bmm(x, z_)
            mu = mu / (1e-6 + mu.norm(dim=1, keepdim=True))
    return mu.permute(0, 2, 1)                              # [b, k, c]


def test_em_matches_reference():
    rng = np.random.RandomState(0)
    b, n, c, k = 2, 50, 32, 3
    x = rng.randn(b, n, c).astype(np.float32)
    mu0 = rng.randn(1, c, k).astype(np.float32)
    mu0 = mu0 / (1e-6 + np.linalg.norm(mu0, axis=1, keepdims=True))

    ours = pmm_em(jax.random.PRNGKey(0), jnp.asarray(x), k,
                  mu0=jnp.asarray(mu0))
    want = torch_em(torch.from_numpy(x).permute(0, 2, 1),
                    torch.from_numpy(mu0).repeat(b, 1, 1)).numpy()
    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-3, atol=1e-4)


def test_prob_map_matches_reference():
    rng = np.random.RandomState(1)
    b, h, w, c, k = 2, 7, 9, 32, 3
    q = rng.randn(b, h, w, c).astype(np.float32)
    mu_f = rng.randn(b, k, c).astype(np.float32)
    mu_b = rng.randn(b, k, c).astype(np.float32)

    got = np.asarray(pmm_prob_map(jnp.asarray(q), jnp.asarray(mu_f),
                                  jnp.asarray(mu_b)))

    # reference discriminative_model (rpmms.py:119-141), NCHW
    tq = torch.from_numpy(q).permute(0, 3, 1, 2)
    mu = torch.cat([torch.from_numpy(mu_f), torch.from_numpy(mu_b)], dim=1)
    mu = mu.permute(0, 2, 1)                                # [b, c, 2k]
    x = tq.reshape(b, c, h * w)
    z = torch.bmm(x.permute(0, 2, 1), mu)
    z = F.softmax(z, dim=2)
    P = z.permute(0, 2, 1).view(b, 2 * k, h, w)
    p_f = P[:, :k].sum(dim=1)
    p_b = P[:, k:].sum(dim=1)
    want = torch.stack([p_b, p_f], dim=-1).numpy()          # [b, h, w, 2]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
