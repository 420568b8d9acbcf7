from .metrics import (loss_function, latent_loss, loss_mapping,
                      compute_metric_bank, METRIC_NAMES)
from .roc import roc_rates, get_rates, auc_score, best_threshold, make_cut
from .deco import mass_deco, cum_distribution
from .bump import bump_hunter, bump_scan, generate_cuts
from .results import plot_results

__all__ = [
    "loss_function", "latent_loss", "loss_mapping", "compute_metric_bank",
    "METRIC_NAMES",
    "roc_rates", "get_rates", "auc_score", "best_threshold", "make_cut",
    "mass_deco", "cum_distribution",
    "bump_hunter", "bump_scan", "generate_cuts",
    "plot_results",
]
