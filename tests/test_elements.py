import numpy as np
import pytest

from lpfem.elements import basis_1d, gauss_legendre, gauss_lobatto_nodes, lagrange_eval


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 11])
def test_gauss_legendre_exactness(n):
    x, w = gauss_legendre(n)
    assert np.isclose(w.sum(), 1.0)
    for deg in range(2 * n):
        exact = 1.0 / (deg + 1)
        assert np.isclose(np.sum(w * x ** deg), exact, atol=1e-13), deg


@pytest.mark.parametrize("p", list(range(1, 11)))
def test_gll_nodes(p):
    nodes = gauss_lobatto_nodes(p)
    assert len(nodes) == p + 1
    assert nodes[0] == 0.0 and nodes[-1] == 1.0
    assert np.all(np.diff(nodes) > 0)
    # symmetric about 1/2
    assert np.allclose(nodes + nodes[::-1], 1.0, atol=1e-14)


@pytest.mark.parametrize("p", [1, 2, 4, 7, 10])
def test_lagrange_partition_of_unity_and_derivative(p):
    b = basis_1d(p)
    # partition of unity at quadrature points
    assert np.allclose(b.B.sum(axis=1), 1.0, atol=1e-12)
    assert np.allclose(b.D.sum(axis=1), 0.0, atol=1e-10)
    # exact interpolation/differentiation of monomials up to degree p
    for deg in range(p + 1):
        vals = b.nodes ** deg
        interp = b.B @ vals
        deriv = b.D @ vals
        assert np.allclose(interp, b.qpts ** deg, atol=1e-11)
        dex = deg * b.qpts ** (deg - 1) if deg > 0 else np.zeros_like(b.qpts)
        assert np.allclose(deriv, dex, atol=1e-9)
    # Bn is the identity
    assert np.allclose(b.Bn, np.eye(p + 1), atol=1e-12)


def test_lagrange_eval_at_nodes_exact_hit():
    nodes = gauss_lobatto_nodes(4)
    B, D = lagrange_eval(nodes, nodes)
    assert np.allclose(B, np.eye(5), atol=1e-13)
    # spectral differentiation of x^3 at the nodes
    d = D @ nodes ** 3
    assert np.allclose(d, 3 * nodes ** 2, atol=1e-11)
