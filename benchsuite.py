"""BASELINE.md benchmark suite: every configured workload, ours (TPU,
one chip) vs the reference C-VM on CPU.

Workloads (BASELINE.md "configs"):
  logreg        sigmoid(X.w+b) xent + grad + SGD update  (fusion + GEMV)
  scan_cumsum   running-sum scan over a 4096 vector
  scan_ewma     exponentially weighted moving average scan
  elman_bptt    Elman RNN fwd + BPTT + SGD update (grad-through-scan)
  gp_mll        GP marginal likelihood: cholesky + solve_triangular +
                logdet + grads
  sparse_matvec CSR matvec (65536^2, ~10 nnz/row)
  fused_gbps    fused-elemwise bandwidth in GB/s (ratio of GB/s)

Timing discipline: on this backend block_until_ready does not
synchronize (remote axon tunnel), so each "ours" measurement chains the
workload's state through `iters` calls (the next call's input depends on
the previous call's device output — shared-variable updates do this
implicitly) and fetches ONE scalar at the end; the fetch round-trip is
included and amortized over the chain, exactly like a real driver loop.
The reference is timed the way PyMC drives it: a Python loop of
synchronous calls on CPU.
"""

from __future__ import annotations

import time

import numpy as np

SUITE_SEED = 0


# --------------------------------------------------------------------------
# ours
# --------------------------------------------------------------------------

def _fetch(x):
    import jax

    return np.asarray(jax.device_get(x))


def _time_chained(run_iter, warm_iters=2, iters=32, repeats=3):
    """run_iter(n) must execute the workload n times with a device-side
    dependency chain and return a scalar-ish device value to fetch."""
    _fetch(run_iter(warm_iters))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _fetch(run_iter(iters))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def ours_logreg(n=8192, d=256, iters=8, k_inner=32):
    from pytensor_tpu.models.logreg import make_logreg_training_step

    # K steps compiled into ONE on-device loop (compile/train.py
    # train_loop) — the TPU deployment pattern.  The reference with the
    # SAME scan-loop formulation measures 571 steps/s vs 624 per-call,
    # so it keeps its faster per-call form.
    f, (Xv, yv), (w, b) = make_logreg_training_step(
        n=n, d=d, dtype="float32", n_steps_per_call=k_inner)
    f.trust_input = True
    import jax

    Xd, yd = jax.device_put(Xv), jax.device_put(yv)

    def run_iter(k):
        loss = None
        for _ in range(k):
            loss = f(Xd, yd)  # shared w,b chain the calls on device
        return loss

    return k_inner / _time_chained(run_iter, iters=iters)


def ours_scan(kind, n=4096, iters=16):
    import jax

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt
    from pytensor_tpu.config import config

    x = pt.tensor("x", dtype="float32", shape=(n,))
    # whole-loop Pallas lowering: the sequence lives in VMEM and the
    # scan runs as ONE kernel (~2.3x the lax.scan path on-chip)
    with config.change_flags(scan__pallas=True):
        if kind == "cumsum":
            tr, _ = ptt.scan(lambda xt, acc: acc + xt, sequences=[x],
                             outputs_info=[pt.constant(0.0, dtype="float32")])
            out = tr / np.float32(n)  # keep the chained state bounded
        else:  # ewma
            tr, _ = ptt.scan(lambda xt, acc: 0.98 * acc + 0.02 * xt,
                             sequences=[x],
                             outputs_info=[pt.constant(0.0, dtype="float32")])
            out = tr
        f = ptt.function([x], out, name=f"scan_{kind}")
    f.trust_input = True
    xd = jax.device_put(np.random.default_rng(SUITE_SEED)
                        .standard_normal(n).astype("float32"))

    def run_iter(k):
        y = xd
        for _ in range(k):
            y = f(y)
        return y[-1]

    return 1.0 / _time_chained(run_iter, iters=iters)


def ours_elman(iters=8, k_inner=16):
    import jax

    from pytensor_tpu.models.rnn import make_elman_rnn_bptt

    # BPTT step inside a compiled 16-step training loop (nested scan:
    # the RNN scan sits inside the train_loop scan)
    f, (Xv, yv), shared = make_elman_rnn_bptt(
        seq_len=64, n_in=32, n_hidden=128, dtype="float32",
        n_steps_per_call=k_inner)
    f.trust_input = True
    Xd, yd = jax.device_put(Xv), jax.device_put(yv)

    def run_iter(k):
        loss = None
        for _ in range(k):
            loss = f(Xd, yd)  # shared weights chain the calls
        return loss

    return k_inner / _time_chained(run_iter, iters=iters)


def ours_gp(n=256, iters=8, k_inner=16):
    from pytensor_tpu.models.gp import make_gp_sgd_step

    # SGD update compiled INTO the step on both sides; ours additionally
    # compiles k_inner steps into one on-device loop (train_loop)
    f, params = make_gp_sgd_step(n=n, dtype="float32",
                                 n_steps_per_call=k_inner)

    def run_iter(k):
        nm = None
        for _ in range(k):
            nm = f()
        return nm

    return k_inner / _time_chained(run_iter, iters=iters)


def ours_sparse(n=65536, nnz_per_row=10, iters=64):
    import jax.numpy as jnp
    import scipy.sparse as sp

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt
    from pytensor_tpu.sparse import as_sparse_variable, structured_dot

    rng = np.random.default_rng(SUITE_SEED)
    A = sp.random(n, n, density=nnz_per_row / n, format="csr",
                  random_state=rng, dtype="float32")
    x = pt.tensor("x", dtype="float32", shape=(n, 1))
    y = structured_dot(as_sparse_variable(A), x)
    f = ptt.function([x], y, name="sparse_matvec")
    f.trust_input = True
    xd = jnp.asarray(rng.standard_normal((n, 1)).astype("float32"))

    def run_iter(k):
        v = xd
        for _ in range(k):
            y = f(v)
            v = y / (jnp.max(jnp.abs(y)) + 1e-9)
        return v[0, 0]

    return 1.0 / _time_chained(run_iter, iters=iters)


FUSED_N = 1 << 26  # 64M elements: large enough that HBM bandwidth,
# not per-call dispatch latency, dominates (the metric is GB/s)


def ours_fused(iters=64):
    import jax

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    x = pt.tensor("x", dtype="float32", shape=(FUSED_N,))
    y = pt.exp(-0.5 * (x - 0.1) ** 2) * 0.999  # fused elemwise chain
    f = ptt.function([x], y, name="fused_elemwise")
    f.trust_input = True
    xd = jax.device_put(np.random.default_rng(SUITE_SEED)
                        .random(FUSED_N).astype("float32"))

    def run_iter(k):
        v = xd
        for _ in range(k):
            v = f(v)
        return v[0]

    dt = _time_chained(run_iter, iters=iters)
    bytes_per_iter = 2 * 4 * FUSED_N  # one f32 read + one f32 write
    return bytes_per_iter / dt / 1e9  # GB/s


# --------------------------------------------------------------------------
# reference (C-VM on CPU)
# --------------------------------------------------------------------------

def _ref_modules():
    import os
    import sys

    sys.path.insert(0, "/root/reference")
    os.environ.setdefault("PYTENSOR_FLAGS",
                          "mode=FAST_RUN,linker=cvm,floatX=float64")
    import pytensor
    import pytensor.tensor as rt

    return pytensor, rt


def _ref_time(call, iters, repeats=3, warm=1):
    for _ in range(warm):
        call()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            call()
        best = min(best, time.perf_counter() - t0)
    return best / iters


def ref_logreg(n=8192, d=256, iters=16):
    pytensor, rt = _ref_modules()
    rng = np.random.default_rng(SUITE_SEED)
    import pytensor as pyt

    w = pyt.shared(np.zeros(d), name="w")
    b = pyt.shared(np.zeros(()), name="b")
    X = rt.dmatrix("X")
    y = rt.dvector("y")
    p = rt.sigmoid(rt.dot(X, w) + b)
    xent = -rt.mean(y * rt.log(p + 1e-7) + (1 - y) * rt.log(1 - p + 1e-7))
    gw, gb = pyt.grad(xent, [w, b])
    f = pyt.function([X, y], xent,
                     updates=[(w, w - 0.1 * gw), (b, b - 0.1 * gb)])
    f.trust_input = True
    Xv = rng.random((n, d))
    yv = (rng.random(n) < 0.5).astype("float64")
    return 1.0 / _ref_time(lambda: f(Xv, yv), iters)


def ref_scan(kind, n=4096, iters=8):
    pytensor, rt = _ref_modules()
    x = rt.dvector("x")
    if kind == "cumsum":
        tr, _ = pytensor.scan(lambda xt, acc: acc + xt, sequences=[x],
                              outputs_info=[np.float64(0.0)])
        out = tr / float(n)
    else:
        tr, _ = pytensor.scan(lambda xt, acc: 0.98 * acc + 0.02 * xt,
                              sequences=[x],
                              outputs_info=[np.float64(0.0)])
        out = tr
    f = pytensor.function([x], out)
    f.trust_input = True
    state = [np.random.default_rng(SUITE_SEED).standard_normal(n)]

    def call():
        state[0] = f(state[0])

    return 1.0 / _ref_time(call, iters)


def ref_elman(iters=8):
    pytensor, rt = _ref_modules()
    import pytensor as pyt

    rng = np.random.default_rng(SUITE_SEED)
    seq_len, n_in, n_hidden, batch = 64, 32, 128, 4
    Wx = pyt.shared(rng.standard_normal((n_in, n_hidden)) * 0.1, name="Wx")
    Wh = pyt.shared(rng.standard_normal((n_hidden, n_hidden)) * 0.1, name="Wh")
    Wo = pyt.shared(rng.standard_normal((n_hidden, 1)) * 0.1, name="Wo")
    X = rt.dtensor3("X")
    y = rt.dvector("y")
    h0 = rt.zeros((X.shape[1], n_hidden))

    def step(xt, hprev, Wx, Wh):
        return rt.tanh(rt.dot(xt, Wx) + rt.dot(hprev, Wh))

    H, _ = pytensor.scan(step, sequences=[X], outputs_info=[h0],
                         non_sequences=[Wx, Wh])
    pred = rt.dot(H[-1], Wo)[:, 0]
    loss = rt.mean((pred - y) ** 2)
    gWx, gWh, gWo = pyt.grad(loss, [Wx, Wh, Wo])
    f = pyt.function([X, y], loss, updates=[
        (Wx, Wx - 0.01 * gWx), (Wh, Wh - 0.01 * gWh), (Wo, Wo - 0.01 * gWo)])
    f.trust_input = True
    Xv = rng.standard_normal((seq_len, batch, n_in))
    yv = rng.standard_normal(batch)
    return 1.0 / _ref_time(lambda: f(Xv, yv), iters)


def ref_gp(n=256, iters=8):
    pytensor, rt = _ref_modules()
    import pytensor as pyt

    rng = np.random.default_rng(SUITE_SEED)
    Xv = rng.random((n, 3))
    yv = np.sin(Xv.sum(axis=1)) + 0.1 * rng.standard_normal(n)
    X = rt.as_tensor_variable(Xv)
    y = rt.as_tensor_variable(yv)
    log_ls = rt.dscalar("log_ls")
    log_amp = rt.dscalar("log_amp")
    log_noise = rt.dscalar("log_noise")
    ls, amp, noise = rt.exp(log_ls), rt.exp(log_amp), rt.exp(log_noise)
    sq = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=-1)
    K = amp ** 2 * rt.exp(-sq / (2 * ls ** 2)) + (noise ** 2 + 1e-8) * rt.eye(n)
    L = rt.linalg.cholesky(K)
    alpha = rt.linalg.solve_triangular(L, y, lower=True)
    logdet = 2.0 * rt.sum(rt.log(rt.diag(L)))
    nmll = 0.5 * rt.sum(alpha ** 2) + 0.5 * logdet \
        + 0.5 * n * float(np.log(2 * np.pi))
    grads = pyt.grad(nmll, [log_ls, log_amp, log_noise])
    f = pyt.function([log_ls, log_amp, log_noise], [nmll, *grads])
    f.trust_input = True
    th = [np.zeros(()) for _ in range(3)]

    def call():
        nm, g0, g1, g2 = f(*th)
        # 0-d numpy arithmetic yields np.float64 scalars; the C-VM with
        # trust_input needs real ndarrays
        th[0] = np.asarray(th[0] - 1e-3 * g0)
        th[1] = np.asarray(th[1] - 1e-3 * g1)
        th[2] = np.asarray(th[2] - 1e-3 * g2)

    return 1.0 / _ref_time(call, iters)


def ref_gp_shared(n=256, iters=8):
    """Reference with the SAME compiled-updates formulation as ours."""
    pytensor, rt = _ref_modules()
    import pytensor as pyt

    rng = np.random.default_rng(SUITE_SEED)
    Xv = rng.random((n, 3))
    yv = np.sin(Xv.sum(axis=1)) + 0.1 * rng.standard_normal(n)
    X = rt.as_tensor_variable(Xv)
    y = rt.as_tensor_variable(yv)
    params = [pyt.shared(np.zeros(()), name=nm)
              for nm in ("log_ls", "log_amp", "log_noise")]
    log_ls, log_amp, log_noise = params
    ls, amp, noise = rt.exp(log_ls), rt.exp(log_amp), rt.exp(log_noise)
    sq = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=-1)
    K = amp ** 2 * rt.exp(-sq / (2 * ls ** 2)) + (noise ** 2 + 1e-8) * rt.eye(n)
    L = rt.linalg.cholesky(K)
    alpha = rt.linalg.solve_triangular(L, y, lower=True)
    nmll = 0.5 * rt.sum(alpha ** 2) + rt.sum(rt.log(rt.diag(L))) \
        + 0.5 * n * float(np.log(2 * np.pi))
    grads = pyt.grad(nmll, params)
    f = pyt.function([], nmll,
                     updates=[(p, p - 1e-3 * g)
                              for p, g in zip(params, grads)])
    f.trust_input = True

    def call():
        f()

    return 1.0 / _ref_time(call, iters)


def ref_sparse(n=65536, nnz_per_row=10, iters=32):
    pytensor, rt = _ref_modules()
    import scipy.sparse as sp
    from pytensor import sparse as psp

    rng = np.random.default_rng(SUITE_SEED)
    A = sp.random(n, n, density=nnz_per_row / n, format="csr",
                  random_state=rng, dtype="float64")
    x = rt.dmatrix("x")
    y = psp.structured_dot(psp.as_sparse_variable(A), x)
    f = pytensor.function([x], y)
    f.trust_input = True
    state = [rng.standard_normal((n, 1))]

    def call():
        y = f(state[0])
        state[0] = y / (np.max(np.abs(y)) + 1e-9)

    return 1.0 / _ref_time(call, iters)


def ref_fused(iters=8):
    pytensor, rt = _ref_modules()
    x = rt.dvector("x")
    y = rt.exp(-0.5 * (x - 0.1) ** 2) * 0.999
    f = pytensor.function([x], y)
    f.trust_input = True
    state = [np.random.default_rng(SUITE_SEED).random(FUSED_N)]

    def call():
        state[0] = f(state[0])

    dt = _ref_time(call, iters)
    bytes_per_iter = 2 * 8 * FUSED_N  # f64 read + write
    return bytes_per_iter / dt / 1e9


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------

WORKLOADS = [
    # (name, ours_fn, ref_fn, unit)
    ("logreg_sgd_step", ours_logreg, ref_logreg, "steps/s"),
    ("scan_cumsum_4096", lambda: ours_scan("cumsum"),
     lambda: ref_scan("cumsum"), "calls/s"),
    ("scan_ewma_4096", lambda: ours_scan("ewma"),
     lambda: ref_scan("ewma"), "calls/s"),
    ("elman_bptt_step", ours_elman, ref_elman, "steps/s"),
    ("gp_mll_grad_256", ours_gp, ref_gp_shared, "evals/s"),
    ("sparse_csr_matvec_65536", ours_sparse, ref_sparse, "matvecs/s"),
    ("fused_elemwise_bandwidth", ours_fused, ref_fused, "GB/s"),
]


def run_suite(verbose=True):
    import sys

    results = {}
    for name, ours_fn, ref_fn, unit in WORKLOADS:
        entry = {"unit": unit}
        try:
            entry["ours"] = round(float(ours_fn()), 2)
        except Exception as e:
            if verbose:
                print(f"suite {name} ours failed: {e!r}", file=sys.stderr)
            entry["ours"] = None
        try:
            entry["ref_cvm"] = round(float(ref_fn()), 2)
        except Exception as e:
            if verbose:
                print(f"suite {name} reference failed: {e!r}", file=sys.stderr)
            entry["ref_cvm"] = None
        if entry["ours"] and entry["ref_cvm"]:
            entry["vs_baseline"] = round(entry["ours"] / entry["ref_cvm"], 2)
        else:
            entry["vs_baseline"] = None
        results[name] = entry
        if verbose:
            print(f"suite {name}: ours={entry['ours']} {unit}, "
                  f"ref={entry['ref_cvm']} {unit}, "
                  f"ratio={entry['vs_baseline']}", file=sys.stderr)
    return results


if __name__ == "__main__":
    import json

    print(json.dumps(run_suite(), indent=2))
