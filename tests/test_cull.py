"""Chunk culling (kernels.cull + the masked Pallas kernel).

The keep-mask must be conservative — culled results bit-identical to
brute force — while actually culling something on a spread-out scene.
"""

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.core.cornell import cornell_box
from raytpu.core.types import Camera, RenderConfig, Scene
from raytpu.kernels.cull import (
    chunk_mask_for,
    chunk_spheres,
    morton_order,
    tile_cones,
)
from raytpu.kernels.intersect_pallas import (
    _tight_chunk,
    closest_hit_masked,
    intersect_pallas_culled,
)
from raytpu.ops.intersect import intersect, tri_constants
from raytpu.render.raytrace import camera_ray_dirs, pixel_grid

TILE_R = 512


def _cluster_scene(n_clusters=4, per_cluster=128, seed=0) -> Scene:
    """Random triangles in well-separated clusters — cluster 0 sits on the
    camera axis (so rays hit), the rest far off-axis; per_cluster matches
    the kernel's 128-triangle chunk so chunk spheres stay cluster-tight
    and most ray tiles provably miss most chunks."""
    rng = np.random.default_rng(seed)
    tris = []
    offsets = [(0.0, 0.0), (40.0, 0.0), (-40.0, 30.0), (0.0, -35.0)]
    for i in range(n_clusters):
        ox, oy = offsets[i % len(offsets)]
        center = np.array([ox, oy, 10.0 + 4.0 * i], np.float32)
        a = rng.normal(scale=0.6, size=(per_cluster, 3)) + center
        tris.append(
            (a, a + rng.normal(scale=0.3, size=(per_cluster, 3)),
             a + rng.normal(scale=0.3, size=(per_cluster, 3)))
        )
    v0 = np.concatenate([t[0] for t in tris]).astype(np.float32)
    v1 = np.concatenate([t[1] for t in tris]).astype(np.float32)
    v2 = np.concatenate([t[2] for t in tris]).astype(np.float32)
    T = v0.shape[0]
    return Scene(
        v0=jnp.asarray(v0), v1=jnp.asarray(v1), v2=jnp.asarray(v2),
        color=jnp.ones((T, 3), jnp.float32),
        active=jnp.ones((T,), jnp.float32),
    )


def _camera_dirs(size=32):
    cam = Camera.raytracer_default()
    cfg = RenderConfig(width=size, height=size)
    xs, ys = pixel_grid(cfg)
    return cam, camera_ray_dirs(xs, ys, cam, cfg)


def test_tile_cones_bound_all_rays():
    _, dirs = _camera_dirs(32)
    axes, cos_half = tile_cones(dirs, TILE_R)
    d = np.asarray(dirs).reshape(-1, TILE_R, 3)
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
    cos_all = np.sum(dn * np.asarray(axes)[:, None, :], axis=-1)
    assert (cos_all >= np.asarray(cos_half)[:, None] - 1e-6).all()


def test_chunk_spheres_bound_vertices():
    scene = _cluster_scene()
    chunk = 64
    centers, radii = chunk_spheres(
        scene.v0, scene.v1, scene.v2, scene.active, chunk
    )
    verts = np.stack(
        [np.asarray(scene.v0), np.asarray(scene.v1), np.asarray(scene.v2)],
        axis=1,
    ).reshape(-1, chunk * 3, 3)
    d = np.linalg.norm(verts - np.asarray(centers)[:, None, :], axis=-1)
    assert (d <= np.asarray(radii)[:, None] * (1 + 1e-5) + 1e-5).all()


def test_masked_kernel_bit_identical_and_culls():
    scene = _cluster_scene()
    cam, dirs = _camera_dirs(32)  # 1024 rays = 2 tiles at TILE_R=512
    consts = tri_constants(scene, cam.pos)

    brute = intersect(dirs, consts, use_pallas=True)
    culled = intersect_pallas_culled(
        dirs, consts, cam.pos, scene.v0, scene.v1, scene.v2,
        tile_r=TILE_R,
    )
    np.testing.assert_array_equal(np.asarray(brute.idx),
                                  np.asarray(culled.idx))
    np.testing.assert_array_equal(np.asarray(brute.t),
                                  np.asarray(culled.t))
    assert np.asarray(brute.hit).any()  # scene actually visible

    # The mask itself must cull a meaningful fraction on this scene.
    chunk = _tight_chunk(scene.num_triangles, 512)
    mask = np.asarray(chunk_mask_for(
        cam.pos, dirs, scene.v0, scene.v1, scene.v2, scene.active,
        TILE_R, chunk,
    ))
    assert mask.mean() < 0.8, f"cull rate too low: keep={mask.mean():.2f}"


def test_all_ones_mask_matches_unmasked():
    """Degenerate mask (keep everything) — pure kernel plumbing check,
    Cornell box geometry."""
    scene = cornell_box()
    cam, dirs = _camera_dirs(32)
    consts = tri_constants(scene, cam.pos)
    chunk = _tight_chunk(scene.num_triangles, 512)
    n_chunks = -(-scene.num_triangles // chunk)
    mask = jnp.ones((dirs.shape[0] // TILE_R, n_chunks), jnp.int32)
    t_m, idx_m = closest_hit_masked(
        dirs, consts.m, consts.k0, consts.valid, mask, TILE_R, 512
    )
    brute = intersect(dirs, consts, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(brute.idx), np.asarray(idx_m))
    np.testing.assert_array_equal(np.asarray(brute.t), np.asarray(t_m))


def test_masked_vjp_matches_brute():
    scene = _cluster_scene(n_clusters=2, per_cluster=64)
    cam, dirs = _camera_dirs(32)
    consts = tri_constants(scene, cam.pos)
    w = jnp.asarray(
        np.random.default_rng(3).normal(size=(dirs.shape[0],)), jnp.float32
    )

    def loss_brute(m):
        from raytpu.kernels.intersect_pallas import closest_hit

        t, idx = closest_hit(dirs, m, consts.k0, consts.valid, TILE_R, 512)
        return jnp.sum(jnp.where(idx >= 0, t, 0.0) * w)

    def loss_culled(m):
        chunk = _tight_chunk(scene.num_triangles, 512)
        mask = chunk_mask_for(cam.pos, dirs, scene.v0, scene.v1, scene.v2,
                              consts.valid, TILE_R, chunk)
        t, idx = closest_hit_masked(dirs, m, consts.k0, consts.valid,
                                    mask, TILE_R, 512)
        return jnp.sum(jnp.where(idx >= 0, t, 0.0) * w)

    g_b = jax.grad(loss_brute)(consts.m)
    g_c = jax.grad(loss_culled)(consts.m)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_c),
                               rtol=1e-6, atol=1e-7)


def test_morton_order_is_permutation_and_localizes():
    scene = _cluster_scene()
    perm = morton_order(scene.v0, scene.v1, scene.v2)
    T = scene.num_triangles
    assert sorted(perm.tolist()) == list(range(T))

    # Spatial sort must shrink the summed chunk radii vs a shuffled order.
    rng = np.random.default_rng(1)
    shuf = rng.permutation(T)

    def total_radius(order):
        _, radii = chunk_spheres(
            scene.v0[order], scene.v1[order], scene.v2[order],
            scene.active, 64,
        )
        return float(np.asarray(radii).sum())

    assert total_radius(perm) < total_radius(shuf)


def test_fused_multi_masked_matches_unmasked():
    """Big-scene fused render path (masked multi kernel, S sources) must
    produce the identical t/idx/occ as the unmasked fused kernel."""
    import jax

    from raytpu.kernels.intersect_pallas import (
        intersect_occluded_multi_pallas,
    )

    scene = _cluster_scene()  # 512 tris -> 4 chunks, masked path engages
    cam, dirs = _camera_dirs(32)
    consts = tri_constants(scene, cam.pos)
    src_pos = jnp.asarray(
        [[0.0, -2.0, -1.0], [3.0, 1.0, 2.0]], jnp.float32
    )
    consts_src = jax.vmap(lambda o: tri_constants(scene, o))(src_pos)

    h_u, occ_u = intersect_occluded_multi_pallas(
        dirs, consts, consts_src, cam.pos, src_pos
    )
    h_m, occ_m = intersect_occluded_multi_pallas(
        dirs, consts, consts_src, cam.pos, src_pos,
        scene_geom=(scene.v0, scene.v1, scene.v2), image_hw=(32, 32),
    )
    np.testing.assert_array_equal(np.asarray(h_u.idx), np.asarray(h_m.idx))
    np.testing.assert_array_equal(np.asarray(h_u.t), np.asarray(h_m.t))
    # occ contract: specified only where the primary ray HIT (miss rays'
    # bits may be culled to 0 — shadow_keep_mask docstring).
    hit = np.asarray(h_u.hit)
    np.testing.assert_array_equal(
        np.asarray(occ_u)[:, hit], np.asarray(occ_m)[:, hit]
    )
    assert hit.any()
    # Culled-away miss bits must only ever flip 1 -> 0, never 0 -> 1.
    assert not (np.asarray(occ_m) & ~np.asarray(occ_u)).any()


def test_big_scene_render_culled_matches_jnp():
    """raytrace_full on a >128-tri scene: the culled Pallas route must
    match the jnp path (hard shadows + soft shadows)."""
    import dataclasses

    from raytpu.core.types import Lights
    from raytpu.render.raytrace import raytrace_full

    scene = _cluster_scene()
    cam = Camera.raytracer_default()
    lights = Lights.single(capacity=1, soft_samples=2,
                           position=(0.0, -2.0, -1.0))
    for kw in (dict(), dict(soft_shadow_samples=2)):
        cfg_p = RenderConfig(width=16, height=16, mode="clean",
                             use_pallas=True, **kw)
        cfg_j = dataclasses.replace(cfg_p, use_pallas=False)
        img_p = raytrace_full(scene, cam, lights, cfg_p).image
        img_j = raytrace_full(scene, cam, lights, cfg_j).image
        np.testing.assert_allclose(
            np.asarray(img_j), np.asarray(img_p), atol=1e-6,
            err_msg=str(kw),
        )


def test_raster_culled_matches_brute():
    """Screen-space chunk culling in the raster winner kernel: winners
    bit-identical, and the mask actually culls on the cluster scene."""
    from raytpu.kernels.raster_pallas import (
        chunk_screen_mask,
        raster_tri_constants,
        resolve_winner_pallas,
    )
    from raytpu.render.soft import _screen_vertices

    scene = _cluster_scene()
    cam = Camera.make((0.0, 0.0, -30.0), focal=32.0)
    cfg = RenderConfig(width=32, height=32)
    sx, sy, zinv, _pos3d = _screen_vertices(scene, cam, cfg)
    keep = scene.active
    consts = raster_tri_constants(sx, sy, zinv, keep)
    ys, xs = jnp.meshgrid(
        jnp.arange(32, dtype=jnp.float32), jnp.arange(32, dtype=jnp.float32),
        indexing="ij",
    )
    px, py = xs.reshape(-1), ys.reshape(-1)

    brute = resolve_winner_pallas(px, py, consts, tile_p=512)
    culled = resolve_winner_pallas(px, py, consts, tile_p=512,
                                   screen_verts=(sx, sy, zinv),
                                   image_hw=(32, 32))
    np.testing.assert_array_equal(np.asarray(brute), np.asarray(culled))
    assert (np.asarray(brute) >= 0).any()

    mask = np.asarray(chunk_screen_mask(
        sx, sy, zinv, consts[:, 12], px, py, 512, 128
    ))
    assert mask.mean() < 0.9, f"raster cull too weak: keep={mask.mean():.2f}"


def test_sharded_big_scene_culled_matches_unsharded():
    """Sharded render of a multi-chunk (>128-tri) scene: each shard's
    culled kernels (primary + position-bound shadow masks) must still
    reproduce the single-device clean render."""
    from raytpu.core.types import Lights
    from raytpu.parallel.mesh import make_mesh
    from raytpu.parallel.render import make_sharded_render
    from raytpu.render.raytrace import raytrace_full

    scene = _cluster_scene()  # 512 tris -> 256-tri blocks at model=2
    cam = Camera.raytracer_default()
    lights = Lights.single(capacity=1, position=(0.0, -2.0, -1.0))
    cfg = RenderConfig(width=16, height=16, mode="clean", use_pallas=True)
    mesh = make_mesh(data=4, model=2)
    img = np.asarray(make_sharded_render(mesh, cfg)(scene, cam, lights))
    ref = np.asarray(raytrace_full(scene, cam, lights, cfg).image)
    np.testing.assert_allclose(img, ref, atol=1e-6)


def test_occlusion_multi_masked_matches_unmasked():
    """Shadow-only masked kernel (known positions) — occ bits must be
    bit-identical for EVERY ray (position_shadow_mask is fully
    conservative, misses included)."""
    from raytpu.kernels.intersect_pallas import occlusion_multi_pallas
    from raytpu.ops.intersect import hit_positions

    scene = _cluster_scene()
    cam, dirs = _camera_dirs(32)
    consts = tri_constants(scene, cam.pos)
    hits = intersect(dirs, consts)
    pos = hit_positions(cam.pos, dirs, hits)
    src_pos = jnp.asarray(
        [[0.0, -2.0, -1.0], [3.0, 1.0, 2.0]], jnp.float32
    )
    consts_src = jax.vmap(lambda o: tri_constants(scene, o))(src_pos)

    occ_u = occlusion_multi_pallas(pos, consts_src, src_pos, scene.active)
    occ_m = occlusion_multi_pallas(
        pos, consts_src, src_pos, scene.active,
        scene_geom=(scene.v0, scene.v1, scene.v2), image_hw=(32, 32),
    )
    np.testing.assert_array_equal(np.asarray(occ_u), np.asarray(occ_m))
