"""Console observability: timed sections and argument banners.

The reference's observability story is stdout prints with wall-clock
timing around hot sections (ref OE-VAE/utils.py:78,120; models.py:164,214)
and a tabulated argument banner (ref OE-VAE/vae.py:85).  These helpers
keep that parity behavior without the scattered print plumbing.
"""

import contextlib
import sys
import time


@contextlib.contextmanager
def timed(message, verbose=True, stream=None):
    """Print ``message ... ( 1.2 s)`` around a block."""
    stream = stream or sys.stdout
    if verbose:
        print(message, end="", flush=True, file=stream)
    start = time.time()
    yield
    if verbose:
        print(f" ({time.time() - start:2.1f} s)", flush=True, file=stream)


def args_banner(args):
    """Tabulated program-arguments banner (ref OE-VAE/vae.py:85)."""
    items = vars(args).items() if hasattr(args, "__dict__") else dict(args).items()
    rows = [(str(k), str(v)) for k, v in items]
    key_w = max((len(k) for k, _ in rows), default=0)
    val_w = max((len(v) for _, v in rows), default=0)
    sep = "+" + "-" * (key_w + 2) + "+" + "-" * (val_w + 2) + "+"
    lines = [sep]
    for k, v in rows:
        lines.append(f"| {k:<{key_w}} | {v:<{val_w}} |")
    lines.append(sep)
    return "\n".join(lines)
