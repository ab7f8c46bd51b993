"""Round-4 regression tests: advisor findings + bench robustness.

Covers the ADVICE.md round-3 items (isoparametric separable-lattice guard,
small-slab-first partition fallback, precision alias semantics, grid-line
validation, z-derivative HBM frugality) and the bench.py transient-failure
retry path that lost the round-3 capture.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from lpfem.configs import preset
from lpfem.mesh import make_cartesian3d, set_curvature
from lpfem.operators import (LaplacePA, NodalZDerivative, SeparableLattice,
                             _matmul_precision)
from lpfem.problem import Problem
from lpfem.shard import Partition
from lpfem.space import H1Space

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_make_cartesian3d_grid_validation():
    with pytest.raises(ValueError, match="strictly increasing"):
        make_cartesian3d(2, 1, 1, 1.0, 1.0, 1.0, xs=[0.0, 0.7, 0.5])
    with pytest.raises(ValueError, match="grid lines"):
        make_cartesian3d(2, 1, 1, 1.0, 1.0, 1.0, xs=[0.0, 1.0])
    # valid graded grid still builds
    m = make_cartesian3d(2, 1, 1, 1.0, 1.0, 1.0, xs=[0.0, 0.3, 1.0])
    assert m.elems.shape[0] == 2


def test_matmul_precision_float32_is_highest():
    import jax
    # JAX's own naming: 'float32' is an alias of Precision.HIGHEST
    assert _matmul_precision("float32") == jax.lax.Precision.HIGHEST
    assert _matmul_precision("highest") == jax.lax.Precision.HIGHEST
    assert _matmul_precision("high") == jax.lax.Precision.HIGH
    assert _matmul_precision(None) is None


def test_separable_refuses_isoparametric_geometry():
    """A geom_order>1 mesh whose CORNERS form an axis-aligned box lattice may
    still have a curved interior map; the Kronecker factorization must refuse
    it (it only inspects corners)."""
    import jax.numpy as jnp
    m = make_cartesian3d(4, 2, 2, 1.0, 0.5, 0.5)
    sp_flat = H1Space(m, 2)
    assert SeparableLattice.build(sp_flat, 3, jnp.float64) is not None
    set_curvature(m, 2)
    assert m.geom_order > 1 and m.geom_nodes is not None
    sp = H1Space(m, 2)
    assert SeparableLattice.build(sp, 3, jnp.float64) is None


def test_partition_small_slab_first_falls_back_to_compact():
    """A valid contiguous z-slab partition with small slabs FIRST does not
    qualify for the window layout (device 0 must carry the padded layer
    count) — it must fall back to the compact layout, not assert."""
    cfg = preset("scaling_base", nx=4, ny=2, nz=8, order=2)
    prob = Problem(cfg)
    st = prob.space.struct
    nex, ney, nez = st.elem_dims
    layer_dev = np.repeat([0, 1, 2, 3], [1, 2, 2, 3])     # small slab first
    part = np.repeat(layer_dev, ney * nex)
    pt = Partition(prob.space, 4, part=part)
    assert pt.win is None
    v = np.random.default_rng(0).standard_normal(prob.space.n_dofs)
    assert np.allclose(pt.unstack_dof(pt.stack_dof(v)), v)
    # largest-first still engages the window layout
    pt2 = Partition(prob.space, 4)
    assert pt2.win is not None


def test_zderivative_drops_full_jacobian_when_affine():
    """On affine meshes the compact [ne,3] metric suffices; the [ne,L,3]
    buffer must not be materialized (hundreds of MB at bench scale)."""
    import jax.numpy as jnp
    m = make_cartesian3d(3, 2, 2, 1.0, 0.5, 0.5)
    op = LaplacePA(H1Space(m, 3))
    zd = NodalZDerivative(op)
    assert zd.Jz3 is not None and zd.Jinv_z is None
    # and the derivative is still exact for a linear field
    sp = op.space
    phi = jnp.asarray(sp.project(lambda x, y, z: 2.5 * z))
    w = np.asarray(zd(phi))
    assert np.allclose(w, 2.5, atol=1e-12)


def test_bench_retry_survives_injected_transient():
    """bench.py must survive one UNAVAILABLE-style failure (wedged-chip
    gotcha that lost the round-3 capture): with an injected failure it
    re-execs once and still emits the JSON metric line."""
    env = dict(os.environ,
               LPFEM_BENCH_FAIL_ONCE="1",
               LPFEM_BENCH_RETRY_SLEEP="0",
               LPFEM_PLATFORM="cpu",
               JAX_PLATFORMS="cpu")
    env.pop("LPFEM_BENCH_RETRY", None)
    res = subprocess.run(
        [sys.executable, "bench.py", "--refs", "0", "--order", "2",
         "--steps", "1", "--repeats", "1", "--no-secondary",
         "--nx", "4", "--ny", "1", "--nz", "2", "--precond", "jacobi"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "re-exec" in res.stderr
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "laplace_dof_throughput"
    assert rec["value"] > 0
    assert rec["detail"]["protocol"].startswith("ss.cpp faithful")
