"""Hand-fused Pallas leapfrog chain for the radon model.

The graph version of a single-chain leapfrog step costs ~23 µs on a v5e:
a small-model MCMC step is *latency-bound* — each of the ~15 XLA kernels
per step pays fixed overhead on 919-element tensors.  This kernel is the
speed-of-light answer: the WHOLE chain runs inside one Pallas program —
data (padded to lane multiples), the one-hot gather/segment-sum matrices,
and the integrator state all live in VMEM; the per-obs gather and the
per-county segment-sum each ride the MXU as statically-unrolled
(1,128)x(128,128) matvecs against the two one-hot layouts;
`lax.fori_loop` steps the integrator with zero kernel-launch overhead.

The gradient is the hand-derived analytic dlogp of the model in
models/radon.py (non-centered hierarchical normal); correctness is
checked against the autodiff graph in tests.
"""

from __future__ import annotations

import numpy as np

LOG_2PI = float(np.log(2.0 * np.pi))

OBS_TILES = 8          # obs padded to OBS_TILES*128
LANE = 128


def make_radon_leapfrog_pallas(n_steps=1024, n_obs=919, n_counties=85,
                               eps=1e-3, seed=0, interpret=False):
    """Return (jitted_fn, theta0, m0, n_params): fn(theta, m) -> (theta', m',
    logp') runs `n_steps` leapfrog steps in one Pallas kernel.

    Requires n_counties <= 124 (params pad to one 128 lane) and
    n_obs <= OBS_TILES*128.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from pytensor_tpu.models.radon import radon_synthetic_data

    if n_counties + 4 > LANE:
        raise ValueError("pallas radon kernel supports n_counties <= 124")
    obs_p = OBS_TILES * LANE
    if n_obs > obs_p:
        raise ValueError(f"pallas radon kernel supports n_obs <= {obs_p}")

    county, floor, y = radon_synthetic_data(n_obs, n_counties, seed, "float32")
    n_params = n_counties + 4

    # --- padded device constants ------------------------------------
    onehot = np.zeros((obs_p, LANE), np.float32)
    onehot[np.arange(n_obs), county] = 1.0          # rows > n_obs stay 0
    # two layouts, one per matmul direction (Mosaic wants plain 2-D
    # (1,128)@(128,128) matvecs, not batched contractions):
    oh_oc = onehot.reshape(OBS_TILES, LANE, LANE)           # [t](obs,c)
    oh_co = np.ascontiguousarray(
        oh_oc.transpose(0, 2, 1))                            # [t](c,obs)
    floor_p = np.zeros((OBS_TILES, LANE), np.float32)
    floor_p.reshape(-1)[:n_obs] = floor
    y_p = np.zeros((OBS_TILES, LANE), np.float32)
    y_p.reshape(-1)[:n_obs] = y
    obs_mask = np.zeros((OBS_TILES, LANE), np.float32)
    obs_mask.reshape(-1)[:n_obs] = 1.0
    cmask = np.zeros((1, LANE), np.float32)
    cmask[0, :n_counties] = 1.0
    basis = np.zeros((4, LANE), np.float32)        # e_{mu_a,lsa,b,lsy}
    for k in range(4):
        basis[k, n_counties + k] = 1.0

    i_mu, i_lsa, i_b, i_lsy = (n_counties, n_counties + 1,
                               n_counties + 2, n_counties + 3)
    half = np.float32(eps / 2.0)
    eps_f = np.float32(eps)
    n_obs_f = np.float32(n_obs)

    def kernel(theta_ref, m_ref, oh_oc_ref, oh_co_ref, floor_ref, y_ref,
               mask_ref, cmask_ref, basis_ref, out_theta_ref, out_m_ref,
               out_lp_ref):
        flr = floor_ref[...]                 # (T,128)
        yv = y_ref[...]
        msk = mask_ref[...]
        cm = cmask_ref[...]                  # (1,128)
        bas = basis_ref[...]                 # (4,128)

        def gather_obs(a_row):               # (1,128c) -> (T,128obs)
            rows = [
                jnp.dot(a_row, oh_co_ref[t],
                        preferred_element_type=jnp.float32)
                for t in range(OBS_TILES)
            ]
            return jnp.concatenate(rows, axis=0)

        def segsum(rs):                      # (T,128obs) -> (1,128c)
            seg = jnp.zeros((1, LANE), jnp.float32)
            for t in range(OBS_TILES):
                seg = seg + jnp.dot(rs[t:t + 1], oh_oc_ref[t],
                                    preferred_element_type=jnp.float32)
            return seg

        def dlogp(theta):                    # theta (1,128) -> grad (1,128)
            a_raw = theta * cm
            mu_a = theta[0, i_mu]
            lsa = theta[0, i_lsa]
            b = theta[0, i_b]
            lsy = theta[0, i_lsy]
            sig_a = jnp.exp(lsa)
            inv_sy = jnp.exp(-lsy)
            a = (mu_a + sig_a * a_raw) * cm                     # (1,128)
            a_obs = gather_obs(a)                               # MXU matvecs
            r = (yv - a_obs - b * flr) * msk * inv_sy           # (T,128)
            rs = r * inv_sy
            seg = segsum(rs) * cm                               # MXU again
            g_a_raw = (sig_a * seg - a_raw) * cm
            g_mu = jnp.sum(seg) - mu_a / 100.0
            g_lsa = sig_a * jnp.sum(a_raw * seg) - lsa / 4.0 + 1.0
            g_b = jnp.sum(rs * flr) - b / 100.0
            g_lsy = jnp.sum(r * r) - n_obs_f - lsy / 4.0 + 1.0
            return (g_a_raw + g_mu * bas[0:1] + g_lsa * bas[1:2]
                    + g_b * bas[2:3] + g_lsy * bas[3:4])

        def logp(theta):
            a_raw = theta * cm
            mu_a = theta[0, i_mu]
            lsa = theta[0, i_lsa]
            b = theta[0, i_b]
            lsy = theta[0, i_lsy]
            sig_a = jnp.exp(lsa)
            inv_sy = jnp.exp(-lsy)
            a = (mu_a + sig_a * a_raw) * cm
            a_obs = gather_obs(a)
            r = (yv - a_obs - b * flr) * msk * inv_sy
            lp = (-0.5 * jnp.sum(r * r) - n_obs_f * (lsy + 0.5 * LOG_2PI)
                  - 0.5 * jnp.sum(a_raw * a_raw)
                  - np.float32(n_counties) * 0.5 * LOG_2PI
                  - 0.5 * (mu_a / 10.0) ** 2 - np.float32(np.log(10.0)) - 0.5 * LOG_2PI
                  - 0.5 * (b / 10.0) ** 2 - np.float32(np.log(10.0)) - 0.5 * LOG_2PI
                  - 0.5 * (lsa / 2.0) ** 2 - np.float32(np.log(2.0)) - 0.5 * LOG_2PI
                  - 0.5 * (lsy / 2.0) ** 2 - np.float32(np.log(2.0)) - 0.5 * LOG_2PI
                  + lsa + lsy)
            return lp

        import jax.lax as lax

        def body(_, carry):
            theta, m = carry
            m_half = m + half * dlogp(theta)
            theta_new = theta + eps_f * m_half
            m_new = m_half + half * dlogp(theta_new)
            return theta_new, m_new

        theta0 = theta_ref[...]
        m0 = m_ref[...]
        theta_f, m_f = lax.fori_loop(0, n_steps, body, (theta0, m0))
        out_theta_ref[...] = theta_f
        out_m_ref[...] = m_f
        out_lp_ref[...] = jnp.full((1, LANE), logp(theta_f), jnp.float32)

    oh_oc_c = jnp.asarray(oh_oc)
    oh_co_c = jnp.asarray(oh_co)
    floor_c = jnp.asarray(floor_p)
    y_c = jnp.asarray(y_p)
    mask_c = jnp.asarray(obs_mask)
    cmask_c = jnp.asarray(cmask)
    basis_c = jnp.asarray(basis)

    out_shapes = (
        jax.ShapeDtypeStruct((1, LANE), jnp.float32),
        jax.ShapeDtypeStruct((1, LANE), jnp.float32),
        jax.ShapeDtypeStruct((1, LANE), jnp.float32),
    )

    @jax.jit
    def run(theta, m):
        th = jnp.zeros((1, LANE), jnp.float32).at[0, :n_params].set(theta)
        mm = jnp.zeros((1, LANE), jnp.float32).at[0, :n_params].set(m)
        t_f, m_f, lp = pl.pallas_call(
            kernel, out_shape=out_shapes, interpret=interpret,
        )(th, mm, oh_oc_c, oh_co_c, floor_c, y_c, mask_c, cmask_c, basis_c)
        return t_f[0, :n_params], m_f[0, :n_params], lp[0, 0]

    rng = np.random.default_rng(0)
    theta0 = np.zeros(n_params, np.float32)
    theta0[i_lsa] = -0.3
    theta0[i_lsy] = -0.3
    m0 = rng.standard_normal(n_params).astype(np.float32)
    return run, theta0, m0, n_params
