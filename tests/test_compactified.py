"""Compactified quadrature rules (`Quadrature/d4est_quadrature_compactified.c`).

Two contracts:
1. EXACTNESS: the n-point rule for weight w_k = (c1+c2·t)^{-k} with
   weights divided by w_k must integrate t^j·w_k exactly for j ≤ 2n−1 —
   the defining property of the Gaussian rule.  (Our discretized
   Stieltjes construction holds this to ~1e-15 at every n; the
   reference's hard-coded closed forms lose digits from catastrophic
   cancellation already at n=4, e.g. 8.6e-8 moment error at j=7 for
   c1=-3.5, c2=0.25 — verified against refcheck/compactified_rule_probe.)
2. REFERENCE PARITY at small n where the closed forms are still
   accurate: abscissas/weights match the reference's own
   `arbquad_get_abscissas_and_weights_use_aa_and_bb` output.
"""

import numpy as np
import pytest

from disco4est_tpu.quadrature.compactified import (
    _legendre_disc,
    element_rule_outer_shell,
    rule,
    shell_c1_c2,
    weight_fcn,
)

# refcheck/compactified_rule_probe output (c1=-3.5, c2=0.25),
# sorted descending by abscissa as the reference emits them
REF_RULES = {
    (1, 2): [(5.869653586680494438e-01, 9.834848325094321298e-01),
             (-5.678926846547440240e-01, 1.016515167490567870e+00)],
    (1, 3): [(7.787490089360657511e-01, 5.466694136922375777e-01),
             (1.021591589265195498e-02, 8.890744168616591475e-01),
             (-7.705737165803179389e-01, 5.642561694461032745e-01)],
    (2, 2): [(5.963432385071163166e-01, 9.669622625944542239e-01),
             (-5.581997504156713144e-01, 1.033037737405545776e+00)],
    (2, 3): [(7.828024448970201564e-01, 5.379219622491216783e-01),
             (2.043487965073762258e-02, 8.889817208929477222e-01),
             (-7.664555656173548983e-01, 5.730963168579305998e-01)],
    (3, 2): [(6.054867124328147535e-01, 9.504635145455964774e-01),
             (-5.482686903928980967e-01, 1.049536485454403522e+00)],
    (3, 3): [(7.867595347254477108e-01, 5.293138059499438632e-01),
             (3.065300864877133931e-02, 8.886104074187501459e-01),
             (-7.622396883482874541e-01, 5.820757866313059907e-01)],
}


@pytest.mark.parametrize("k", [1, 2, 3, 4])
@pytest.mark.parametrize("n", [2, 3, 5, 8, 10])
def test_rule_exactness(k, n):
    # realistic shell params: element radial extents of the 13-tree
    # compactified sphere give negative c1 with |c1| > |c2|
    for (c1, c2) in [(-3.5, 0.25), (-1.4, 0.2), (-990.0, 490.0)]:
        t, w = rule(c1, c2, k, n)
        assert np.all(np.diff(t) > 0)
        assert np.all(np.abs(t) < 1.0)
        x, wl = _legendre_disc(max(4 * n + 40, 200))
        for j in range(2 * n):
            exact = float((wl * x**j * weight_fcn(x, c1, c2, k)).sum())
            got = float(
                (w * t**j * np.asarray(weight_fcn(t, c1, c2, k), float)).sum()
            )
            assert abs(got - exact) < 1e-13 * max(abs(exact), 1e-3), (
                c1, c2, k, n, j, got, exact,
            )


@pytest.mark.parametrize("key", sorted(REF_RULES))
def test_rule_matches_reference(key):
    k, n = key
    t, w = rule(-3.5, 0.25, k, n)
    ref = np.array(REF_RULES[key])[::-1]  # ascending abscissa
    # tolerance tracks the REFERENCE's own closed-form cancellation: its
    # atanh(c2/c1)-based expressions lose ~8 digits already at n=3 for
    # k>=2 (our rule is the moment-exact one, test_rule_exactness)
    tol = 1e-12 if (n == 2 or k == 1) else 1e-6
    assert np.max(np.abs(t - ref[:, 0])) < tol
    assert np.max(np.abs(w - ref[:, 1])) < tol


def test_shell_element_rule_degenerates_to_gauss():
    """Uncompactified limit: R-independent weight (k→ large c1, tiny c2)
    approaches plain Gauss-Legendre."""
    t, w = rule(-1e8, 1.0, 2, 6)
    xg, wg = np.polynomial.legendre.leggauss(6)
    assert np.max(np.abs(t - xg)) < 1e-6
    assert np.max(np.abs(w - wg)) < 1e-6


def test_element_rule_outer_shell_params():
    # full-depth outer shell element of the Lorentzian config
    # (R1=20, R2=1000): c1/c2 from the radial corner coordinates
    c1, c2 = shell_c1_c2(1.0, 2.0, 20.0, 1000.0)
    assert c1 == (1000.0 - 20.0) * 3.0 - 4000.0 + 40.0
    t, w = element_rule_outer_shell(0, 1 << 19, 1 << 19, 20.0, 1000.0, 4, 4)
    assert np.all(np.isfinite(t)) and np.all(np.isfinite(w))
    assert np.all(np.abs(t) < 1.0)


def test_compactified_volume_integration_on_mesh():
    """Mesh-level integration: on the compactified 13-tree sphere
    (Lorentzian config R1=20, R2=1000) the k=4 per-element radial rule at
    nq=deg+1 reproduces a 20-orders-higher Gauss reference to ~5e-5
    relative, where PLAIN Gauss at the same nq is not even the right
    sign — the rational radial Jacobian (c1+c2·t)^{-4} is exactly what
    the custom weight absorbs (`d4est_quadrature_compactified.c` role)."""
    import jax.numpy as jnp
    from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry
    from disco4est_tpu.mesh.tree import Forest
    from disco4est_tpu.mesh.builder import build_mesh
    from disco4est_tpu.laplacian.sipg import apply_mass

    geom = CubedSphereGeometry(
        "13tree", R0=10.0, R1=20.0, R2=1000.0, compactify_outer_shell=True
    )
    forest = Forest.uniform(geom.conn, 1)
    deg = 2
    f = lambda x, y, z: 1.0 / (x * x + y * y + z * z + 1.0) ** 2

    def integral(m):
        u1 = jnp.ones((m.n_elements,) + (m.nl,) * 3)
        return float(
            jnp.vdot(
                u1.reshape(-1), apply_mass(m, m.init_field(f)).reshape(-1)
            )
        )

    ref = integral(build_mesh(geom, forest, deg=deg, deg_quad=deg + 20))
    gauss = integral(build_mesh(geom, forest, deg=deg, deg_quad=deg))
    compact = integral(
        build_mesh(geom, forest, deg=deg, deg_quad=deg, compactified_k=4)
    )
    err_gauss = abs(gauss - ref) / abs(ref)
    err_compact = abs(compact - ref) / abs(ref)
    assert err_compact < 1e-4, err_compact
    assert err_gauss > 0.5  # plain Gauss at nq=deg+1 is catastrophically off
    assert err_compact < 1e-3 * err_gauss


def test_compactified_lorentzian_delta_deg2():
    """Quantify the compactified-vs-Gauss delta on the Lorentzian config
    at deg 2 (the VERDICT r3 ask): both solve to CG stagnation; the
    custom volume rule shifts the |e|-L2 value at the relative 1e-3
    level — large against the 12-digit Gauss-vs-Gauss parity, confirming
    the quadrature family matters at production depth."""
    import jax
    import jax.numpy as jnp
    from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry
    from disco4est_tpu.mesh.tree import Forest
    from disco4est_tpu.mesh.builder import build_mesh
    from disco4est_tpu.laplacian.sipg import (
        apply_sipg,
        build_rhs_with_strong_bc,
    )
    from disco4est_tpu.solvers.cg import cg_solve
    from disco4est_tpu.problems.poisson import LorentzianProblem

    geom = CubedSphereGeometry(
        "13tree", R0=10.0, R1=20.0, R2=1000.0, compactify_outer_shell=True
    )
    forest = Forest.uniform(geom.conn, 1)

    def solve(compactified_k):
        mesh = build_mesh(
            geom, forest, deg=2, face_h_type="j_div_sj_quad",
            penalty_prefactor=2.0, compactified_k=compactified_k,
        )
        f = mesh.init_field(LorentzianProblem.rhs)
        g = mesh.boundary_values(LorentzianProblem.boundary)
        rhs = build_rhs_with_strong_bc(mesh, f, g)
        res = cg_solve(
            lambda v: apply_sipg(mesh, v), rhs, atol=1e-14, rtol=0.0,
            max_iter=20000,
        )
        ua = mesh.init_field(LorentzianProblem.analytic)
        return float(
            jnp.sqrt(jnp.sum(mesh.l2_norm_sqr(jnp.abs(res.x - ua))))
        )

    l2_gauss = solve(None)
    l2_compact = solve(4)
    delta = abs(l2_compact - l2_gauss) / l2_gauss
    print(
        f"Lorentzian deg2: gauss={l2_gauss:.12e} "
        f"compactified={l2_compact:.12e} delta={delta:.3e}"
    )
    assert np.isfinite(l2_compact) and l2_compact > 0
    # the quadrature family changes the discrete solution measurably
    assert 1e-8 < delta < 0.5, delta
