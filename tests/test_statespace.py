"""Parity tests of the basis-tensor state spaces against reference oracles.

Oracle values in tests/fixtures/statespace.npz were produced by running the
reference implementation (see tests/fixtures/generate_fixtures.py); the
constructions here are independent (misti_tpu/model/statespace.py).
"""

import numpy as np

from conftest import load_fixture
from misti_tpu.model import statespace as ss


def test_enumeration_is_bijective():
    b = ss.two_pop_basis()
    assert b.n == 44
    # stationary (cross-population two-lineage) states match reference indices
    assert list(np.nonzero(b.stationary_mask)[0]) == [30, 31, 34, 35, 38, 39, 42]


def test_two_pop_matrix_matches_reference():
    fx = load_fixture("statespace.npz")
    for rates, mref in zip(fx["two_rates"], fx["two_mats"]):
        m = ss.two_pop_matrix(*rates)
        assert mref.shape == (44, 44)
        np.testing.assert_allclose(m, mref, rtol=0, atol=1e-12)


def test_two_pop_matrix_nomig_reduced():
    """With mu=0 the reference deletes the 7 stationary rows/cols (37x37)."""
    fx = load_fixture("statespace.npz")
    m = ss.two_pop_matrix(1.3, 0.7, 0.0, 0.0)
    keep = np.setdiff1d(np.arange(44), fx["stationary_idx"])
    np.testing.assert_allclose(
        m[np.ix_(keep, keep)], fx["two_mat_nomig"], rtol=0, atol=1e-12
    )
    # and the deleted columns carry no outflow into kept states when mu=0
    assert np.all(m[np.ix_(keep, fx["stationary_idx"])] == 0)


def test_one_pop_matrix_matches_reference():
    fx = load_fixture("statespace.npz")
    np.testing.assert_allclose(
        ss.one_pop_matrix(0.9), fx["one_mat"], rtol=0, atol=1e-12
    )


def test_jsfs_maps_match_reference():
    fx = load_fixture("statespace.npz")
    np.testing.assert_array_equal(ss.two_pop_basis().jsfs, fx["two_jsfs"])
    np.testing.assert_array_equal(ss.one_pop_basis().jsfs, fx["one_jsfs"])


def test_pulse_operator_matches_reference():
    import jax

    fx = load_fixture("statespace.npz")
    for pop in (0, 1):
        r = float(fx[f"pulse_rate_pop{pop}"])
        P = np.asarray(jax.jit(ss.pulse_operator, static_argnums=1)(r, pop))
        np.testing.assert_allclose(P, fx[f"pulse_mat_pop{pop}"], rtol=1e-12, atol=1e-13)
    # r = 0 must be the identity (lets us apply pulses unconditionally)
    P0 = np.asarray(ss.pulse_operator(0.0, 0))
    np.testing.assert_allclose(P0, np.eye(44), atol=0)


def test_ancient_operator_matches_reference():
    fx = load_fixture("statespace.npz")
    np.testing.assert_allclose(ss.two_pop_basis().ancient, fx["ancient_mat"], atol=0)


def test_collapse_matrix():
    b = ss.two_pop_basis()
    assert b.collapse.shape == (8, 44)
    assert np.all(b.collapse.sum(axis=0) == 1)  # every state maps somewhere


def test_generator_column_sums():
    """Columns leak only through coalescence into the absorbing state."""
    b = ss.two_pop_basis()
    m = ss.two_pop_matrix(1.7, 0.4, 0.9, 2.1)
    colsum = m.sum(axis=0)
    assert np.all(colsum <= 1e-12)  # sub-generator
    # migration terms alone are mass-conserving
    mig_only = ss.two_pop_matrix(0.0, 0.0, 0.9, 2.1)
    np.testing.assert_allclose(mig_only.sum(axis=0), 0, atol=1e-12)


def test_correction_matrix():
    m = ss.correction_matrix(1.2, 0.8, 0.5, 0.3)
    ref = np.array(
        [
            [-2 * 0.5 - 1.2, 0.0, 0.3],
            [0.0, -2 * 0.3 - 0.8, 0.5],
            [2 * 0.5, 2 * 0.3, -0.5 - 0.3],
        ]
    )
    np.testing.assert_allclose(m, ref, atol=1e-15)
