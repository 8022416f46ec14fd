from .errors import ErrorsProvider
from .llr import probs_to_llr, binary_prior_llr

__all__ = ["ErrorsProvider", "probs_to_llr", "binary_prior_llr"]
