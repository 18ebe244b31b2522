"""Low-level TPU kernels: batched linear algebra and log-sum-exp."""

from .linalg import CholResult, bilinear_sym, chol_inv_det, symmetrize
from .lse import logsumexp, logsumexp2D, regularize, tiny
from .random import chi2_log, chisquare, student_t_scale
