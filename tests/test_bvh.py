"""BVH builder + traversal tests: structural invariants, native/NumPy agreement,
and traversal == brute force (the property that actually matters)."""

import numpy as np
import pytest

from bevyray_tpu.bvh import build as bvh_build
from bevyray_tpu.bvh import native as bvh_native
from bevyray_tpu.bvh.build import (build_ploc_np, build_scene_bvh, flatten_tree,
                                   sphere_aabbs)
from bevyray_tpu.core.types import make_spheres_np
from bevyray_tpu.core.vec import Vec3
from bevyray_tpu.kernels.intersect import intersect_spheres
from bevyray_tpu.kernels.traverse import intersect_bvh

import jax.numpy as jnp


def _random_scene(n, seed):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 1.5, n).astype(np.float32)
    return centers, radii


def _check_flat_bvh(fmin, fmax, index, count, prim_ids, n_prims,
                    max_leaf_size=1):
    """Structural invariants of the reference node layout (extract.rs:229-237);
    with multi-prim leaves (wgsl:311) each leaf covers a contiguous
    ``prim_ids`` run and every prim appears in exactly one run."""
    n_nodes = fmin.shape[0]
    leaves = count > 0
    assert count.max() <= max_leaf_size
    if max_leaf_size == 1:
        prims = index[leaves]
    else:
        prims = np.concatenate([prim_ids[index[i]:index[i] + count[i]]
                                for i in np.nonzero(leaves)[0]])
    assert sorted(prims.tolist()) == list(range(n_prims))
    # Inner nodes: children adjacent, in range, and contained in parent bounds.
    for i in np.nonzero(~leaves)[0]:
        c = index[i]
        assert 0 < c and c + 1 < n_nodes
        for ch in (c, c + 1):
            assert (fmin[i] <= fmin[ch] + 1e-5).all()
            assert (fmax[i] >= fmax[ch] - 1e-5).all()


@pytest.mark.parametrize("n", [1, 2, 3, 7, 100, 485])
def test_numpy_ploc_invariants(n):
    centers, radii = _random_scene(n, seed=n)
    bmin, bmax = sphere_aabbs(centers, radii)
    tree = build_ploc_np(bmin, bmax)
    flat = flatten_tree(*tree)
    _check_flat_bvh(*flat, n_prims=n)


@pytest.mark.parametrize("n", [1, 2, 3, 7, 100, 485])
@pytest.mark.parametrize("k", [2, 4, 8])
def test_multi_prim_leaf_invariants(n, k):
    """Collapsed ≤k-prim leaves: every prim in exactly one contiguous
    prim_ids run, counts ≤ k, parents still contain children."""
    centers, radii = _random_scene(n, seed=n)
    bmin, bmax = sphere_aabbs(centers, radii)
    tree = build_ploc_np(bmin, bmax)
    flat = flatten_tree(*tree, max_leaf_size=k)
    _check_flat_bvh(*flat, n_prims=n, max_leaf_size=k)
    # Leaf AABBs must still bound their prims' inflated boxes.
    fmin, fmax, index, count, prim_ids = flat
    for i in np.nonzero(count > 0)[0]:
        ids = prim_ids[index[i]:index[i] + count[i]]
        assert (fmin[i] <= bmin[ids] + 1e-5).all()
        assert (fmax[i] >= bmax[ids] - 1e-5).all()


def test_native_builder_available_and_valid():
    """The C++ builder must compile on this machine and produce a valid tree."""
    lib = bvh_native.ensure_built()
    assert lib is not None, "native PLOC builder failed to build"
    centers, radii = _random_scene(300, seed=1)
    bmin, bmax = sphere_aabbs(centers, radii)
    built = bvh_native.build_ploc_native(bmin, bmax, bvh_build.SEARCH_RADIUS)
    assert built is not None
    flat = flatten_tree(*built)
    _check_flat_bvh(*flat, n_prims=300)


def test_native_and_numpy_same_sah_quality():
    """Trees needn't be identical, but total surface area should be comparable."""
    centers, radii = _random_scene(200, seed=3)
    bmin, bmax = sphere_aabbs(centers, radii)
    native = bvh_native.build_ploc_native(bmin, bmax, bvh_build.SEARCH_RADIUS)
    if native is None:
        pytest.skip("no native builder")

    def total_sa(node_min, node_max):
        d = np.maximum(node_max - node_min, 0)
        return (2 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])).sum()

    nm, nx, *_ = native
    pm, px, *_ = build_ploc_np(bmin, bmax)
    ratio = total_sa(nm, nx) / total_sa(pm, px)
    assert 0.8 < ratio < 1.25


@pytest.mark.parametrize("n_spheres", [1, 5, 60, 300])
@pytest.mark.parametrize("leaf_size", [1, 4])
def test_traversal_matches_brute_force(n_spheres, leaf_size):
    centers, radii = _random_scene(n_spheres, seed=n_spheres + 7)
    spheres = make_spheres_np(centers, radii, np.arange(n_spheres))
    bvh = build_scene_bvh(centers, radii, max_leaf_size=leaf_size)

    rng = np.random.RandomState(0)
    n_rays = 256
    o = rng.uniform(-12, 12, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    origin = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    direction = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    t_brute, i_brute = intersect_spheres(origin, direction, spheres)
    t_bvh, i_bvh = intersect_bvh(origin, direction, spheres, bvh,
                                 max_leaf_size=leaf_size)

    np.testing.assert_allclose(np.asarray(t_bvh), np.asarray(t_brute), rtol=1e-5)
    # Where ts tie between spheres the index may legitimately differ; require
    # index agreement when the hit is unique.
    hit = np.asarray(t_brute) < 1e30
    if hit.any():
        same = np.asarray(i_bvh)[hit] == np.asarray(i_brute)[hit]
        assert same.mean() > 0.99


def test_rays_from_inside_scene():
    """Slab test must return 0 for boxes containing the origin (wgsl:396)."""
    centers, radii = _random_scene(50, seed=2)
    spheres = make_spheres_np(centers, radii, np.arange(50))
    bvh = build_scene_bvh(centers, radii)
    # Rays starting at sphere centers, shooting outward.
    o = centers[:32]
    d = np.tile(np.array([[0.3, 0.5, -0.8]], np.float32), (32, 1))
    origin = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    direction = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    t_brute, _ = intersect_spheres(origin, direction, spheres)
    t_bvh, _ = intersect_bvh(origin, direction, spheres, bvh)
    np.testing.assert_allclose(np.asarray(t_bvh), np.asarray(t_brute), rtol=1e-5)


def test_triangle_bvh_traversal_matches_brute_force():
    """The triangle BVH (the reference's planned ModelBVH, extract.rs:239-248)
    must find exactly the same nearest hits as the brute-force pass."""
    from bevyray_tpu.bvh.build import build_triangle_bvh
    from bevyray_tpu.core.types import make_triangles_np
    from bevyray_tpu.kernels.intersect import intersect_triangles
    from bevyray_tpu.kernels.traverse import intersect_bvh_triangles

    rng = np.random.RandomState(11)
    n_tris = 200
    base = rng.uniform(-8, 8, (n_tris, 3)).astype(np.float32)
    va = base
    vb = base + rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    vc = base + rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    tris = make_triangles_np(va, vb, vc, np.zeros(n_tris, np.int32))
    bvh = build_triangle_bvh(va, vb, vc)

    n_rays = 256
    o = rng.uniform(-10, 10, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    origin = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    direction = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    t_brute, i_brute = intersect_triangles(origin, direction, tris)
    t_bvh, i_bvh = intersect_bvh_triangles(origin, direction, tris, bvh)
    np.testing.assert_allclose(np.asarray(t_bvh), np.asarray(t_brute), rtol=1e-5)
    hit = np.asarray(t_brute) < 1e30
    assert hit.sum() >= 5
    assert (np.asarray(i_bvh)[hit] == np.asarray(i_brute)[hit]).mean() > 0.99


@pytest.mark.parametrize("leaf_size", [1, 4])
def test_mesh_scene_bvh_backend_matches_brute(leaf_size):
    from bevyray_tpu import (RenderConfig, Renderer, RaytracedCamera, Raytracing,
                             StandardMaterial, Transform, cube_mesh)
    from bevyray_tpu.scene.world import World

    w = World()
    w.set_camera(Transform.from_xyz(0, 0.5, 6).looking_at((0, 0.5, 0)),
                 camera=RaytracedCamera(level=Raytracing.PURE))
    w.spawn_sphere(Transform.from_xyz(-1.5, 0.5, 0),
                   __import__("bevyray_tpu").RaytracedSphere(0.5),
                   StandardMaterial(base_color=(0, 0, 1)))
    w.spawn_mesh(Transform.from_xyz(1.2, 0.5, 0), cube_mesh(1.0),
                 StandardMaterial(base_color=(1, 1, 0)))
    scene = w.extract(with_bvh=True, bvh_leaf_size=leaf_size)
    cam = w.camera_state(aspect=1.0)
    kw = dict(width=32, height=32, samples_per_pixel=2, bounces=3, level=3)
    brute = np.asarray(Renderer(RenderConfig(**kw, intersect_backend="brute"))
                       .render(scene, cam, seed=4).image)
    bvh = np.asarray(Renderer(RenderConfig(**kw, intersect_backend="bvh",
                                           bvh_leaf_size=leaf_size))
                     .render(scene, cam, seed=4).image)
    np.testing.assert_allclose(bvh, brute, atol=1e-6)


def test_bvh_negative_radius_bounds():
    """Negative-radius spheres (hollow-glass trick) must get real AABBs —
    a signed radius would invert the box and the BVH would cull the bubble."""
    import numpy as np
    from bevyray_tpu.bvh.build import sphere_aabbs

    bmin, bmax = sphere_aabbs(np.array([[0.0, 0.5, 0.0]], np.float32),
                              np.array([-0.4], np.float32))
    assert (bmax - bmin > 0.9).all()   # 2*(0.4+0.1) per axis
