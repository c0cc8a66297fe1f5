"""Elman RNN forward + BPTT: the Scan-suite benchmark config
(BASELINE.md: "Elman RNN forward and BPTT through scan grad")."""

from __future__ import annotations

import numpy as np

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt


def make_elman_rnn_bptt(seq_len=64, n_in=32, n_hidden=128, dtype="float32", n_steps_per_call=1,
                        lr=0.01, seed=0, mode=None):
    """Compiled training step of an Elman RNN: scan forward, BPTT, SGD
    updates — the whole loop is one XLA executable."""
    rng = np.random.default_rng(seed)
    Wx = ptt.shared((rng.standard_normal((n_in, n_hidden)) * 0.1).astype(dtype),
                    name="Wx")
    Wh = ptt.shared((rng.standard_normal((n_hidden, n_hidden)) * 0.1).astype(dtype),
                    name="Wh")
    Wo = ptt.shared((rng.standard_normal((n_hidden, 1)) * 0.1).astype(dtype),
                    name="Wo")
    X = pt.tensor("X", dtype=dtype, shape=(seq_len, None, n_in))
    y = pt.tensor("y", dtype=dtype, shape=(None,))
    batch = X.shape[1]
    h0 = pt.zeros((batch, n_hidden), dtype=dtype)

    def step(xt, hprev, Wx, Wh):
        return pt.tanh(pt.dot(xt, Wx) + pt.dot(hprev, Wh))

    H, _ = ptt.scan(step, sequences=[X], outputs_info=[h0],
                    non_sequences=[Wx, Wh], name="elman")
    pred = pt.dot(H[-1], Wo)[:, 0]
    loss = pt.mean((pred - y) ** 2)
    gWx, gWh, gWo = ptt.grad(loss, [Wx, Wh, Wo])
    updates = {Wx: Wx - lr * gWx, Wh: Wh - lr * gWh, Wo: Wo - lr * gWo}
    if n_steps_per_call > 1:
        f = ptt.train_loop([X, y], loss, updates, n_steps=n_steps_per_call,
                           mode=mode, name="elman_loop")
    else:
        f = ptt.function([X, y], loss, updates=updates, mode=mode,
                         name="elman_step")
    Xv = rng.standard_normal((seq_len, 4, n_in)).astype(dtype)
    yv = rng.standard_normal(4).astype(dtype)
    return f, (Xv, yv), (Wx, Wh, Wo)
