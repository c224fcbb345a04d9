"""Scene IR: the parse product as inspectable typed entity lists.

Role model: the reference's ``BasicScene`` / ``*SceneEntity`` records
(scene.h:35-257 — SceneEntity:35, CameraSceneEntity:69,
ShapeSceneEntity:89, LightSceneEntity:179, InstanceSceneEntity:195): "the
parse product is data, not live objects".  The parser populates a
``SceneIR`` alongside compiling device arrays, so tools can inspect,
transform, or re-emit what a scene file declared without touching the
compiled pools.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional


@dataclasses.dataclass
class SceneEntity:
    """name + parameters + source location (scene.h:35)."""
    name: str
    params: dict            # param name -> (type, values)
    loc: str = ""


@dataclasses.dataclass
class ShapeSceneEntity(SceneEntity):
    ctm: Any = None                      # 4x4 object-to-world at declaration
    material: int = -1                   # compiled material index
    reverse_orientation: bool = False
    area_light: bool = False
    inside_medium: int = -1
    outside_medium: int = -1


@dataclasses.dataclass
class LightSceneEntity(SceneEntity):
    ctm: Any = None


@dataclasses.dataclass
class InstanceSceneEntity(SceneEntity):
    ctm: Any = None


@dataclasses.dataclass
class SceneIR:
    camera: Optional[SceneEntity] = None
    film: Optional[SceneEntity] = None
    sampler: Optional[SceneEntity] = None
    integrator: Optional[SceneEntity] = None
    shapes: list = dataclasses.field(default_factory=list)
    lights: list = dataclasses.field(default_factory=list)
    area_lights: list = dataclasses.field(default_factory=list)
    materials: list = dataclasses.field(default_factory=list)
    named_materials: dict = dataclasses.field(default_factory=dict)
    textures: list = dataclasses.field(default_factory=list)
    media: dict = dataclasses.field(default_factory=dict)
    instances: list = dataclasses.field(default_factory=list)
    instance_definitions: dict = dataclasses.field(default_factory=dict)

    def summary(self) -> dict:
        """Entity counts by kind (observability / test hook)."""
        return dict(
            shapes=len(self.shapes), lights=len(self.lights),
            area_lights=len(self.area_lights),
            materials=len(self.materials),
            named_materials=len(self.named_materials),
            textures=len(self.textures), media=len(self.media),
            instances=len(self.instances),
            instance_definitions=len(self.instance_definitions))

    def shapes_of(self, kind: str):
        return [s for s in self.shapes if s.name == kind]
