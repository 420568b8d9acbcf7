from .fused_mlp import fused_mlp_apply
from .gammainc import log_gammainc_lower, log_gammainc_upper, sigma_from_log_pval
from .emd import emd_pairs, ks_pairs

__all__ = ["fused_mlp_apply", "log_gammainc_lower", "log_gammainc_upper",
           "sigma_from_log_pval", "emd_pairs", "ks_pairs"]
