"""Benchmark / flagship model graphs built with pytensor_tpu.

These are the workloads from BASELINE.md: the PyMC hierarchical radon
logp+grad (NUTS inner loop), logistic regression, GP marginal
likelihood, and an Elman RNN BPTT — expressed as expression graphs the
way a PyMC-style user would write them.
"""

from pytensor_tpu.models.radon import make_radon_logp_grad, radon_synthetic_data
from pytensor_tpu.models.logreg import make_logreg_training_step
from pytensor_tpu.models.gp import make_gp_marginal_likelihood
from pytensor_tpu.models.rnn import make_elman_rnn_bptt
