"""A complete HMC transition kernel compiled as one XLA executable.

Demonstrates the full stack end-to-end: leapfrog integration via scan,
Metropolis accept/reject with on-device RNG, shared-state threading —
the whole sampler step never leaves the chip.
"""

from __future__ import annotations

import numpy as np

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.graph.replace import graph_replace
from pytensor_tpu.tensor.random import RandomStream


def make_hmc_step(make_logp_graph, n_params, n_leapfrog=16, step_size=0.02,
                  dtype="float32", seed=0, mode=None):
    """Build a compiled HMC transition.

    make_logp_graph() -> (theta_input_var, logp_var).
    Returns (step_fn, position_shared): each call advances the chain one
    HMC transition on device and returns (logp, accepted).
    """
    theta_in, logp = make_logp_graph()
    dlogp = ptt.grad(logp, theta_in)

    srng = RandomStream(seed=seed)
    position = ptt.shared(np.zeros(n_params, dtype), name="hmc_position")

    m0 = srng.normal(0.0, 1.0, size=(n_params,))
    m0 = pt.cast(m0, dtype)

    def leapfrog(theta, m):
        g = graph_replace(dlogp, {theta_in: theta})
        m_half = m + (step_size / 2) * g
        theta_new = theta + step_size * m_half
        g_new = graph_replace(dlogp, {theta_in: theta_new})
        m_new = m_half + (step_size / 2) * g_new
        return theta_new, m_new

    (thetas, ms), lf_updates = ptt.scan(
        leapfrog, outputs_info=[position, m0], n_steps=n_leapfrog,
        name="hmc_leapfrog",
    )
    theta_prop = thetas[-1]
    m_prop = ms[-1]

    logp0 = graph_replace(logp, {theta_in: position})
    logp1 = graph_replace(logp, {theta_in: theta_prop})
    h0 = logp0 - 0.5 * pt.sum(m0 ** 2)
    h1 = logp1 - 0.5 * pt.sum(m_prop ** 2)
    log_accept_ratio = h1 - h0

    u = srng.uniform(0.0, 1.0)
    accept = pt.lt(pt.log(u), log_accept_ratio)
    new_position = pt.switch(accept, theta_prop, position)
    new_logp = pt.switch(accept, logp1, logp0)

    updates = dict(lf_updates)
    updates[position] = pt.cast(new_position, dtype)

    step = ptt.function([], [new_logp, accept], updates=updates, mode=mode,
                        name="hmc_step")
    return step, position


def make_radon_hmc(n_obs=919, n_counties=85, dtype="float32", **kwargs):
    from pytensor_tpu.models.radon import make_radon_graphs

    def build():
        inputs, (logp, _dlogp), n_params = make_radon_graphs(
            n_obs=n_obs, n_counties=n_counties, dtype=dtype
        )
        return inputs[0], logp

    n_params = n_counties + 4
    return make_hmc_step(build, n_params, dtype=dtype, **kwargs)


def make_radon_hmc_chains(n_chains=256, n_obs=919, n_counties=85,
                          n_leapfrog=16, step_size=0.02, dtype="float32",
                          seed=0, mesh=None):
    """Multi-chain HMC: every chain advances one full transition per call,
    all on device.  With ``mesh`` given, chains shard over the mesh's
    'data' axis (SPMD via GSPMD; each device integrates its chain block —
    embarrassingly parallel, zero collectives in the hot loop).

    Returns (step_fn, position_shared, n_params); step_fn() -> (logp
    per chain, accept per chain).
    """
    from pytensor_tpu.models.radon import make_radon_logp_batched

    theta_in, logp, dlogp, n_params = make_radon_logp_batched(
        n_obs=n_obs, n_counties=n_counties, dtype=dtype, seed=seed)

    srng = RandomStream(seed=seed)
    position = ptt.shared(
        np.zeros((n_chains, n_params), dtype), name="hmc_chains_position")
    m0 = pt.cast(srng.normal(0.0, 1.0, size=(n_chains, n_params)), dtype)

    def leapfrog(theta, m):
        g = graph_replace(dlogp, {theta_in: theta})
        m_half = m + (step_size / 2) * g
        theta_new = theta + step_size * m_half
        g_new = graph_replace(dlogp, {theta_in: theta_new})
        m_new = m_half + (step_size / 2) * g_new
        return theta_new, m_new

    (thetas, ms), lf_updates = ptt.scan(
        leapfrog, outputs_info=[position, m0], n_steps=n_leapfrog,
        name="hmc_chains_leapfrog",
    )
    theta_prop = thetas[-1]
    m_prop = ms[-1]

    logp0 = graph_replace(logp, {theta_in: position})
    logp1 = graph_replace(logp, {theta_in: theta_prop})
    h0 = logp0 - 0.5 * pt.sum(m0 ** 2, axis=1)
    h1 = logp1 - 0.5 * pt.sum(m_prop ** 2, axis=1)
    log_accept_ratio = h1 - h0

    u = srng.uniform(0.0, 1.0, size=(n_chains,))
    accept = pt.lt(pt.log(pt.cast(u, dtype)), log_accept_ratio)
    new_position = pt.switch(accept[:, None], theta_prop, position)
    new_logp = pt.switch(accept, logp1, logp0)

    updates = dict(lf_updates)
    updates[position] = new_position

    if mesh is None:
        f = ptt.function([], [new_logp, accept], updates=updates,
                         name="hmc_chains_step")
    else:
        from pytensor_tpu import parallel

        # output shardings are inferred by GSPMD (update outputs for the
        # RNG states are replicated; chain outputs follow the data axis)
        f = parallel.function(
            [], [new_logp, accept], updates=updates, mesh=mesh,
            shared_specs={position: parallel.spec("data", None)},
            name="hmc_chains_step",
        )
    return f, position, n_params


def make_multinomial_hmc_step(make_logp_graph, n_params, n_leapfrog=16,
                              step_size=0.02, dtype="float32", seed=0):
    """Multinomial HMC: sample a state from the whole trajectory with
    weights softmax(H_t) instead of accepting only the endpoint
    (Betancourt 2017, "A conceptual introduction to HMC", app. A.3 —
    what modern NUTS implementations do within each trajectory).

    Whole transition = one XLA executable: leapfrog scan traces H along
    the trajectory, a Gumbel-max draw picks the next state on device.
    """
    theta_in, logp = make_logp_graph()
    dlogp = ptt.grad(logp, theta_in)

    srng = RandomStream(seed=seed)
    position = ptt.shared(np.zeros(n_params, dtype), name="mhmc_position")
    m0 = pt.cast(srng.normal(0.0, 1.0, size=(n_params,)), dtype)

    def leapfrog(theta, m):
        g = graph_replace(dlogp, {theta_in: theta})
        m_half = m + (step_size / 2) * g
        theta_new = theta + step_size * m_half
        g_new = graph_replace(dlogp, {theta_in: theta_new})
        m_new = m_half + (step_size / 2) * g_new
        return theta_new, m_new

    (thetas, ms), lf_updates = ptt.scan(
        leapfrog, outputs_info=[position, m0], n_steps=n_leapfrog,
        name="mhmc_leapfrog",
    )

    # H_t along the trajectory (including the start point)
    def H(theta, m):
        return graph_replace(logp, {theta_in: theta}) - 0.5 * pt.sum(m ** 2)

    Hs, _ = ptt.scan(lambda th, mm: H(th, mm), sequences=[thetas, ms],
                     name="mhmc_energies")
    H0 = H(position, m0)
    all_H = pt.concatenate([H0[None], Hs], axis=0)     # (T+1,)
    all_theta = pt.concatenate([position[None, :], thetas], axis=0)

    # Gumbel-max: idx = argmax(H_t + G_t) samples \propto exp(H_t)
    u = srng.uniform(0.0, 1.0, size=(n_leapfrog + 1,))
    gumbel = -pt.log(-pt.log(pt.cast(u, dtype) + 1e-12) + 1e-12)
    idx = pt.argmax(all_H + gumbel)
    new_position = all_theta[idx]
    new_logp = graph_replace(logp, {theta_in: new_position})

    updates = dict(lf_updates)
    updates[position] = new_position
    f = ptt.function([], [new_logp, idx], updates=updates,
                     name="multinomial_hmc_step")
    return f, position


def make_radon_multinomial_hmc(n_obs=919, n_counties=85, dtype="float32",
                               **kwargs):
    from pytensor_tpu.models.radon import make_radon_graphs

    inputs, (logp, _), n_params = make_radon_graphs(
        n_obs=n_obs, n_counties=n_counties, dtype=dtype)

    def build():
        return inputs[0], logp

    return (*make_multinomial_hmc_step(build, n_params, **kwargs), n_params)
