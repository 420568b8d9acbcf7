from .expr import evaluate_cut, CutError
from .chunks import index_ranges, bin_edges
from .logging import timed, args_banner

__all__ = ["evaluate_cut", "CutError", "index_ranges", "bin_edges", "timed", "args_banner"]
