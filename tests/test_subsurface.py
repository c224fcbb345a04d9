"""BSSRDF subsurface scattering (reference bssrdf.h:105 TabulatedBSSRDF /
wavefront subsurface.cpp; TPU substitution: Burley normalized diffusion)."""
import pytest
import numpy as np
import jax.numpy as jnp


def _sss_scene(mfp=0.2):
    from pbrt_tpu import scene_core as sc
    from pbrt_tpu.utils import spectrum as spc
    b = sc.SceneBuilder()
    m = b.materials.add_subsurface(reflectance=(0.8, 0.4, 0.3),
                                   mfp=(mfp,) * 3, eta=1.33)
    # a slab (top face at y=0)
    V = np.asarray([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2],
                    [-2, -0.5, -2], [2, -0.5, -2], [2, -0.5, 2],
                    [-2, -0.5, 2]], np.float32)
    F = np.asarray([[0, 2, 1], [0, 3, 2],         # top (upward)
                    [4, 5, 6], [4, 6, 7]])         # bottom
    b.add_mesh(V, F, m)
    b.add_uniform_infinite_light(spc.ConstantSpectrum(1.0))
    return b.build(force_bvh=False)


def test_subsurface_material_pool_flags():
    scene = _sss_scene()
    from pbrt_tpu import bxdfs
    assert scene.materials.has_subsurface
    assert bxdfs.BXDF_DIFFUSE in scene.materials.bxdf_tags_present
    assert bxdfs.BXDF_CONDUCTOR in scene.materials.bxdf_tags_present


@pytest.mark.slow
def test_subsurface_render_finite_and_colored():
    from pbrt_tpu.integrators import render as rdr
    from pbrt_tpu.integrators.path import PathOptions
    from pbrt_tpu import cameras as cam_mod
    from pbrt_tpu.utils import transform as tfm
    scene = _sss_scene()
    cam = cam_mod.make_camera(
        "perspective", fov=50, width=24, height=24,
        camera_from_world=tfm.look_at((0, 2.5, 2.5), (0, 0, 0),
                                      (0, 1, 0)).inverse())
    img, _ = rdr.render(scene, cam, spp=16, opts=PathOptions(max_depth=5))
    a = np.asarray(img)
    assert np.isfinite(a).all()
    # central slab pixels lit and tinted (R reflectance > B)
    c = a[8:16, 8:16]
    assert c.mean() > 0.01
    assert c[..., 0].mean() > c[..., 2].mean()


@pytest.mark.slow
def test_subsurface_mfp_controls_translucency():
    """Small mfp -> surface-like (brighter local response at normal
    incidence); the render differs measurably from large mfp."""
    from pbrt_tpu.integrators import render as rdr
    from pbrt_tpu.integrators.path import PathOptions
    from pbrt_tpu import cameras as cam_mod
    from pbrt_tpu.utils import transform as tfm
    cam = cam_mod.make_camera(
        "perspective", fov=50, width=16, height=16,
        camera_from_world=tfm.look_at((0, 2.5, 2.5), (0, 0, 0),
                                      (0, 1, 0)).inverse())
    imgs = []
    for mfp in (0.02, 0.8):
        scene = _sss_scene(mfp)
        img, _ = rdr.render(scene, cam, spp=16,
                            opts=PathOptions(max_depth=5))
        imgs.append(np.asarray(img))
    diff = np.abs(imgs[0] - imgs[1]).mean()
    assert diff > 1e-3


def test_burley_radial_profile_normalized():
    """The two-exponential radial density integrates to 1."""
    d = 0.37
    r = np.linspace(1e-5, 60 * d, 400000)
    pdf = 0.25 / d * (np.exp(-r / d) + np.exp(-r / (3 * d)))
    total = np.trapezoid(pdf, r)
    np.testing.assert_allclose(total, 1.0, rtol=1e-3)
