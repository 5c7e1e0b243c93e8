"""Property tests of the neighbor pipeline against O(N^2) brute force."""

import jax.numpy as jnp
import numpy as np
import pytest

from salva_tpu.geometry import (
    GroupInfo,
    build_grid,
    evaluate_contacts,
    find_neighbors,
    morton_key,
    weighted_sum_over_neighbors,
)
from salva_tpu.kernels import sph


def _random_points(rng, n, dim, scale=1.0):
    return jnp.asarray(rng.uniform(-scale, scale, size=(n, dim)), jnp.float32)


def _default_groups(n, model=0):
    return GroupInfo(
        memberships=jnp.full((n,), 1, jnp.uint32),
        filter=jnp.full((n,), 0xFFFFFFFF, jnp.uint32),
        model=jnp.full((n,), model, jnp.int32),
    )


def _brute_force(points, alive, h):
    pts = np.asarray(points)
    al = np.asarray(alive)
    n = len(pts)
    out = []
    for i in range(n):
        row = set()
        if al[i]:
            for j in range(n):
                if al[j] and np.sum((pts[i] - pts[j]) ** 2) <= h * h:
                    row.add(j)
        out.append(row)
    return out


@pytest.mark.parametrize("dim", [2, 3])
def test_neighbors_match_brute_force(dim):
    rng = np.random.default_rng(0)
    n = 200
    h = 0.4
    pts = _random_points(rng, n, dim)
    alive = jnp.asarray(rng.uniform(size=n) > 0.1)
    grid = build_grid(pts, alive, h, dim)
    groups = _default_groups(n)
    nl = find_neighbors(
        pts, alive, groups, grid, pts, alive, groups,
        h, dim, max_neighbors=128, max_candidates=256,
        same_model_always=True,
    )
    assert int(nl.overflow) == 0
    assert int(nl.cand_overflow) == 0

    expected = _brute_force(pts, alive, h)
    idx = np.asarray(nl.idx)
    valid = np.asarray(nl.valid)
    for i in range(n):
        got = set(idx[i][valid[i]])
        assert got == expected[i], f"particle {i}: {got} != {expected[i]}"
        assert int(np.asarray(nl.count)[i]) == len(expected[i])


def test_neighbors_include_self():
    dim = 3
    pts = jnp.asarray([[0.0, 0.0, 0.0], [10.0, 10.0, 10.0]], jnp.float32)
    alive = jnp.ones((2,), bool)
    grid = build_grid(pts, alive, 0.5, dim)
    groups = _default_groups(2)
    nl = find_neighbors(
        pts, alive, groups, grid, pts, alive, groups,
        0.5, dim, max_neighbors=8, max_candidates=32, same_model_always=True,
    )
    valid = np.asarray(nl.valid)
    idx = np.asarray(nl.idx)
    # Each isolated particle sees exactly itself (self-contacts included,
    # matching the reference same-cell pair enumeration).
    assert valid.sum() == 2
    assert idx[0][valid[0]][0] == 0
    assert idx[1][valid[1]][0] == 1


def test_interaction_groups_filtering():
    """Different models with disjoint groups must not interact; same model
    always interacts (`contacts.rs:276-281,355-362`)."""
    dim = 2
    pts = jnp.zeros((4, 2), jnp.float32)  # all on top of each other
    alive = jnp.ones((4,), bool)
    mem = jnp.asarray([1, 1, 2, 2], jnp.uint32)
    flt = jnp.asarray([1, 1, 2, 2], jnp.uint32)  # only interact within group
    model = jnp.asarray([0, 0, 1, 1], jnp.int32)
    groups = GroupInfo(mem, flt, model)
    grid = build_grid(pts, alive, 0.5, dim)
    nl = find_neighbors(
        pts, alive, groups, grid, pts, alive, groups,
        0.5, dim, max_neighbors=8, max_candidates=32, same_model_always=True,
    )
    idx = np.asarray(nl.idx)
    valid = np.asarray(nl.valid)
    for i in range(4):
        got = set(idx[i][valid[i]])
        expected = {0, 1} if i < 2 else {2, 3}
        assert got == expected

    # Now with filters that allow everything, all 4 interact.
    groups_all = _default_groups(4)
    nl2 = find_neighbors(
        pts, alive, groups_all, grid, pts, alive, groups_all,
        0.5, dim, max_neighbors=8, max_candidates=32, same_model_always=True,
    )
    assert np.asarray(nl2.count).tolist() == [4, 4, 4, 4]


def test_overflow_detection():
    dim = 2
    pts = jnp.zeros((20, 2), jnp.float32)
    alive = jnp.ones((20,), bool)
    groups = _default_groups(20)
    grid = build_grid(pts, alive, 0.5, dim)
    nl = find_neighbors(
        pts, alive, groups, grid, pts, alive, groups,
        0.5, dim, max_neighbors=8, max_candidates=64, same_model_always=True,
    )
    # 20 coincident particles, K=8 -> 12 dropped per particle.
    assert int(nl.overflow) == 20 * 12
    assert np.all(np.asarray(nl.count) == 20)


def test_chunked_query_equals_unchunked():
    rng = np.random.default_rng(3)
    dim = 3
    n = 150
    h = 0.3
    pts = _random_points(rng, n, dim)
    alive = jnp.ones((n,), bool)
    groups = _default_groups(n)
    grid = build_grid(pts, alive, h, dim)
    a = find_neighbors(
        pts, alive, groups, grid, pts, alive, groups,
        h, dim, 64, 128, True, query_chunk=n,
    )
    b = find_neighbors(
        pts, alive, groups, grid, pts, alive, groups,
        h, dim, 64, 128, True, query_chunk=32,
    )
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


@pytest.mark.parametrize("dim", [2, 3])
def test_weighted_sum_matches_neighbor_list(dim):
    rng = np.random.default_rng(7)
    n = 120
    h = 0.35
    pts = _random_points(rng, n, dim)
    alive = jnp.ones((n,), bool)
    groups = _default_groups(n)
    grid = build_grid(pts, alive, h, dim)
    nl = find_neighbors(
        pts, alive, groups, grid, pts, alive, groups,
        h, dim, 128, 256, True,
    )
    contacts = evaluate_contacts(pts, pts, nl, h, dim)
    direct, _ = weighted_sum_over_neighbors(
        pts, alive, groups, grid, pts, alive, groups,
        h, dim, 256, True, sph.cubic_w,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.sum(contacts.w, axis=1)),
        np.asarray(direct),
        rtol=1e-5,
    )


def test_morton_key_locality():
    """Adjacent cells must produce distinct keys (no systematic collision)."""
    cells = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1], [2, 0, 0]],
        jnp.int32,
    )
    keys = np.asarray(morton_key(cells, 3))
    assert len(set(keys.tolist())) == len(keys)
    # Negative coords wrap deterministically.
    neg = jnp.asarray([[-1, -1, -1]], jnp.int32)
    k1 = np.asarray(morton_key(neg, 3))
    k2 = np.asarray(morton_key(neg, 3))
    assert k1 == k2
