"""Property-based tests for the data core (cuts DSL, scalers).

The cuts DSL must agree with Python's own evaluation on every
expression in its documented grammar (the reference passes cut strings
through ``eval``, ref OE-VAE/utils.py:171-173 — the DSL replaces that
with a safe AST walker and must not drift from eval semantics), and
fitted scalers must invert what they apply.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from atlasvae.data.scalers import apply_scaler, fit_scaler, inverse_scaler
from atlasvae.utils.expr import evaluate_cut

KEYS = ["m", "pt", "weights"]
CMPS = ["<", "<=", ">", ">=", "==", "!="]


@st.composite
def cut_expr(draw, depth=0):
    """A random expression from the DSL grammar, as the reference would
    write it: comparisons on sample columns, arithmetic, & | ~ chains."""
    if depth >= 2 or draw(st.booleans()):
        key = draw(st.sampled_from(KEYS))
        arith = draw(st.sampled_from(
            ["", " * 2", " + 10", " - 5", " / 4"]))
        cmp_ = draw(st.sampled_from(CMPS))
        const = draw(st.integers(-50, 150))
        return f'(sample["{key}"]{arith} {cmp_} {const})'
    a = draw(cut_expr(depth=depth + 1))
    b = draw(cut_expr(depth=depth + 1))
    op = draw(st.sampled_from(["&", "|"]))
    neg = draw(st.sampled_from(["", "~"]))
    return f"{neg}({a} {op} {b})"


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(cut_expr(), st.integers(0, 2**31 - 1))
def test_cuts_dsl_matches_python_eval(expr, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 40))
    sample = {"m": rng.uniform(0, 200, n),
              "pt": rng.uniform(0, 3000, n),
              "weights": rng.uniform(0, 2, n)}
    got = evaluate_cut(expr, sample)
    want = np.asarray(eval(expr), dtype=bool)  # trusted generated string
    np.testing.assert_array_equal(got, want, err_msg=expr)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.sampled_from(["RobustScaler", "MaxAbsScaler", "PowerTransformer"]),
       st.integers(0, 2**31 - 1))
def test_scaler_inverse_roundtrip(scaler_type, seed):
    """inverse(apply(x)) ~= x for every scaler with an exact inverse
    (quantile is a rank map, only invertible on its fit support)."""
    rng = np.random.default_rng(seed)
    x = np.abs(rng.normal(2, 3, (int(rng.integers(8, 200)), 3))) + 0.1
    scaler = fit_scaler(x, scaler_type=scaler_type, verbose=False)
    y = apply_scaler(x, scaler=scaler, verbose=False)
    assert np.isfinite(y).all()
    back = inverse_scaler(x if scaler is None else y, scaler=scaler)
    np.testing.assert_allclose(back, x, rtol=2e-3, atol=2e-3)
