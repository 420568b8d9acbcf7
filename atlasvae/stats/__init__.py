from .bumphunter import (BumpHunter1D, scan_histograms, batched_bump_sigma,
                         batched_local_sigma)
from .fit import fit_gaussian, gaussian

__all__ = ["BumpHunter1D", "scan_histograms", "batched_bump_sigma",
           "batched_local_sigma", "fit_gaussian", "gaussian"]
