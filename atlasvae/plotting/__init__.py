from .bump import plot_bump_histogram, plot_stat_distribution, plot_tomography
from .history import plot_history
from .distributions import plot_distributions, sample_distributions
from .extras import (tsne_embedding, combine_roc_curves, pt_reconstruction,
                     ks_distance, bin_meshgrid)
from .aae_plots import (plot_discriminant, plot_correlations, binary_dics_eff,
                        smoothing)

__all__ = ["plot_bump_histogram", "plot_stat_distribution", "plot_tomography",
           "plot_history", "plot_distributions", "sample_distributions",
           "tsne_embedding", "combine_roc_curves", "pt_reconstruction",
           "ks_distance", "bin_meshgrid",
           "plot_discriminant", "plot_correlations", "binary_dics_eff",
           "smoothing"]
