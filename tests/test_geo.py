"""Geometry/polynomial kernel tests (the L0 layer equivalents)."""

import numpy as np
import pytest

from dftpav_tpu import geo


class TestConvexHull:
    def test_square_with_interior_points(self):
        pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1],
                        [0.5, 0.5], [0.2, 0.8]])
        hull = geo.convex_hull2d(pts)
        assert len(hull) == 4
        assert set(map(tuple, hull)) == {(0, 0), (1, 0), (1, 1), (0, 1)}

    def test_ccw_orientation(self):
        pts = np.random.default_rng(0).normal(size=(50, 2))
        hull = geo.convex_hull2d(pts)
        area2 = 0.0
        for i in range(len(hull)):
            a, b = hull[i], hull[(i + 1) % len(hull)]
            area2 += a[0] * b[1] - a[1] * b[0]
        assert area2 > 0  # CCW

    def test_all_points_inside(self):
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(100, 2))
        hull = geo.convex_hull2d(pts)
        for i in range(len(hull)):
            a, b = hull[i], hull[(i + 1) % len(hull)]
            n = np.array([-(b - a)[1], (b - a)[0]])
            assert np.all((pts - a) @ n >= -1e-9)


class TestLinprog:
    def test_simple_min(self):
        # min x + y s.t. x >= 1, y >= 2 (as -x <= -1, -y <= -2)
        x = geo.linprog2d(np.array([1.0, 1.0]),
                          np.array([[-1.0, 0.0], [0.0, -1.0]]),
                          np.array([-1.0, -2.0]))
        np.testing.assert_allclose(x, [1.0, 2.0], atol=1e-6)

    def test_infeasible(self):
        x = geo.linprog2d(np.array([1.0, 0.0]),
                          np.array([[1.0, 0.0], [-1.0, 0.0]]),
                          np.array([-1.0, -1.0]))  # x <= -1 and x >= 1
        assert x is None

    def test_triangle_vertex(self):
        # min -x - y over triangle x,y >= 0, x + y <= 1 -> (any vertex of
        # the x+y=1 edge); optimum value = -1
        x = geo.linprog2d(np.array([-1.0, -1.0]),
                          np.array([[-1.0, 0.0], [0.0, -1.0], [1.0, 1.0]]),
                          np.array([0.0, 0.0, 1.0]))
        assert x is not None
        assert x[0] + x[1] == pytest.approx(1.0, abs=1e-6)


class TestPolytope:
    def unit_box(self):
        A = np.array([[1.0, 0], [-1, 0], [0, 1], [0, -1]])
        b = np.array([1.0, 1.0, 1.0, 1.0])
        return A, b

    def test_chebyshev_center_box(self):
        A, b = self.unit_box()
        c, r = geo.chebyshev_center2d(A, b)
        np.testing.assert_allclose(c, [0.0, 0.0], atol=1e-3)
        assert r == pytest.approx(1.0, abs=1e-3)

    def test_vertices_of_box(self):
        A, b = self.unit_box()
        V = geo.halfplane_vertices(A, b)
        assert len(V) == 4
        assert set(map(tuple, np.round(V, 6))) == {
            (1, 1), (1, -1), (-1, -1), (-1, 1)}

    def test_empty_polytope(self):
        A = np.array([[1.0, 0.0], [-1.0, 0.0]])
        b = np.array([-1.0, -1.0])
        V = geo.halfplane_vertices(A, b)
        assert len(V) == 0


class TestPolyRoots:
    def test_cubic_roots(self):
        # (t-1)(t-2)(t+3) = t^3 - 7t + 6: ascending [6, -7, 0, 1]
        r = geo.poly_roots([6.0, -7.0, 0.0, 1.0])
        np.testing.assert_allclose(r, [-3.0, 1.0, 2.0], atol=1e-9)

    def test_interval_filter(self):
        r = geo.poly_roots([6.0, -7.0, 0.0, 1.0], lo=0.0, hi=1.5)
        np.testing.assert_allclose(r, [1.0], atol=1e-9)

    def test_minmax_on_interval(self):
        # f(t) = t^2 - 2t on [0, 3]: min -1 at t=1, max 3 at t=3
        mn, mx = geo.poly_minmax_on_interval([0.0, -2.0, 1.0], 0.0, 3.0)
        assert mn == pytest.approx(-1.0, abs=1e-9)
        assert mx == pytest.approx(3.0, abs=1e-9)


class TestCorridorBuilders:
    def test_star_convex_excludes_obstacles(self):
        from dftpav_tpu.corridor_builders import star_convex_corridor
        rng = np.random.default_rng(0)
        ang = rng.uniform(0, 2 * np.pi, 60)
        r = rng.uniform(8, 12, 60)
        pts = np.stack([r * np.cos(ang), r * np.sin(ang)], 1)
        h = star_convex_corridor(np.zeros(2), pts, radius=50.0)
        n, p = h[:, :2], h[:, 2:]
        assert np.all(np.sum(n * (np.zeros(2) - p), 1) <= 1e-9)
        for q in pts:
            assert np.any(np.sum(n * (q - p), 1) > -1e-9)

    def test_star_convex_free_space_box(self):
        from dftpav_tpu.corridor_builders import star_convex_corridor
        h = star_convex_corridor(np.array([1.0, 2.0]), np.zeros((0, 2)),
                                 max_x=20.0, max_y=10.0)
        n, p = h[:, :2], h[:, 2:]
        assert np.all(np.sum(n * (np.array([1.0, 2.0]) - p), 1) <= 1e-9)

    def test_ellipsoid_decomp_contains_segment(self):
        from dftpav_tpu.corridor_builders import ellipsoid_decomp2d
        pts = np.array([[5.0, 2.0], [5.0, -2.0], [12.0, 1.5], [-3.0, 1.0]])
        h, (C, c) = ellipsoid_decomp2d([0, 0], [10, 0], pts)
        n, p = h[:, :2], h[:, 2:]
        for q in ([0, 0], [10, 0], [5, 0]):
            assert np.all(np.sum(n * (np.asarray(q) - p), 1) <= 1e-7)
        for q in pts:
            assert np.any(np.sum(n * (q - p), 1) > -1e-7)
