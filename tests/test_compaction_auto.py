"""Pin the compaction auto-default (VERDICT r4 weak #5): forcing
compaction ON for brute-force scenes is a measured 5.4x regression on the
cornell bench (14.7 -> 2.7 Mpaths/s, ROUND4.md); the auto heuristic must
stay OFF for brute-force pools and ON for Pallas-BVH8-backed scenes."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import types

from pbrt_tpu.integrators import path as path_mod


def _scene(bvh8=False, bvh8c=False):
    return types.SimpleNamespace(use_pallas_bvh8=bvh8,
                                 use_pallas_bvh8c=bvh8c)


def test_auto_off_for_brute_force():
    opts = path_mod.PathOptions(compaction="auto")
    assert path_mod._resolve_compaction(_scene(), opts) is False


def test_auto_on_for_bvh8_scenes():
    opts = path_mod.PathOptions(compaction="auto")
    assert path_mod._resolve_compaction(_scene(bvh8=True), opts) is True
    assert path_mod._resolve_compaction(_scene(bvh8c=True), opts) is True


def test_explicit_override_wins():
    assert path_mod._resolve_compaction(
        _scene(bvh8=True), path_mod.PathOptions(compaction=False)) is False
    assert path_mod._resolve_compaction(
        _scene(), path_mod.PathOptions(compaction=True)) is True


def test_cornell_resolves_off():
    """The flagship bench scene itself must resolve to OFF."""
    from pbrt_tpu import scenes
    scene, _ = scenes.make_cornell_box(width=8, height=8)
    assert path_mod._resolve_compaction(
        scene, path_mod.PathOptions(compaction="auto")) is False
