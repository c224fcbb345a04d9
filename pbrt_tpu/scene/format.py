"""Scene-file formatter / upgrader.

Role model: the reference's ``FormattingParserTarget`` (parser.h:202,
parser.cpp:1038-1934) behind ``pbrt --format`` / ``--upgrade`` / ``--toply``:
re-emit a .pbrt scene with canonical indentation, optionally applying the
pbrt-v3 -> v4 upgrade rules (material renames, parameter renames, RGB->scalar
scale conversions) and optionally extracting large triangle meshes to
binary .ply files.

This is a token-stream pass: tokenize -> directive records -> printer.  No
scene is compiled.
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from .parser import tokenize_with_offsets, _DIRECTIVES, _parse_value

# number of CTM args per transform directive
_XFORM_ARGS = {"Translate": 3, "Scale": 3, "Rotate": 4, "LookAt": 9,
               "Transform": 16, "ConcatTransform": 16, "TransformTimes": 2}

# pbrt-v3 material name -> (v4 name, param renames) ; richer rules in code
_SIMPLE_MAT_RENAMES = {
    "matte": "diffuse", "substrate": "coateddiffuse", "glass": "dielectric",
    "plastic": "coateddiffuse", "kdsubsurface": "subsurface",
    "metal": "conductor", "translucent": "diffusetransmission",
    "disney": "diffuse", "uber": "coateddiffuse",
}


class _Params:
    """Ordered parameter list [(type, name, values)] with edit helpers."""

    def __init__(self):
        self.items = []

    def get(self, name):
        for it in self.items:
            if it[1] == name:
                return it
        return None

    def remove(self, name):
        it = self.get(name)
        if it:
            self.items.remove(it)
        return it

    def rename(self, old, new):
        it = self.get(old)
        if it:
            it[1] = new

    def retype(self, name, new_type):
        it = self.get(name)
        if it:
            it[0] = new_type

    def add(self, ty, name, vals):
        self.items.append([ty, name, list(vals)])


def _read_directive(toks, pos):
    """Returns (name, args, params, new_pos). args: bare strings/numbers
    following the directive; params: _Params."""
    name = toks[pos]
    pos += 1
    nargs = _XFORM_ARGS.get(name)
    args = []
    if nargs is not None:
        for _ in range(nargs):
            args.append(_parse_value(toks[pos]))
            pos += 1
    else:
        # quoted bare string arguments (1 for most, 2 for MediumInterface,
        # 3 for Texture header, ActiveTransform keyword)
        want = {"Texture": 3, "MediumInterface": 2, "Attribute": 1}.get(name, 1)
        if name in ("WorldBegin", "WorldEnd", "AttributeBegin", "AttributeEnd",
                    "TransformBegin", "TransformEnd", "ObjectEnd", "Identity",
                    "ReverseOrientation"):
            want = 0
        if name == "ActiveTransform":
            args.append(toks[pos])
            pos += 1
            want = 0
        taken = 0
        while taken < want and pos < len(toks):
            t = toks[pos]
            if isinstance(t, str) and t.startswith('"'):
                inner = t[1:-1]
                if " " in inner and taken == want - 1 and name != "Texture":
                    break  # param declaration, not a bare arg
                args.append(inner)
                pos += 1
                taken += 1
            else:
                break
        if name == "MediumInterface" and taken == 1:
            args.append("")  # outside medium omitted
    params = _Params()
    while pos < len(toks):
        t = toks[pos]
        if not (isinstance(t, str) and t.startswith('"')):
            break
        decl = t[1:-1].split()
        if len(decl) < 2:
            break
        pos += 1
        ty, pname = decl[0], " ".join(decl[1:])
        vals = []
        if pos < len(toks) and toks[pos] == "[":
            pos += 1
            while toks[pos] != "]":
                vals.append(_parse_value(toks[pos]))
                pos += 1
            pos += 1
        else:
            vals.append(_parse_value(toks[pos]))
            pos += 1
        params.add(ty, pname, vals)
    return name, args, params, pos


def _fmt_value(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:g}"
    return f'"{v}"'


class Formatter:
    def __init__(self, upgrade=False, toply=False, out=None, ply_dir=".",
                 ply_threshold=500):
        self.upgrade = upgrade
        self.toply = toply
        self.out = out or sys.stdout
        self.ply_dir = Path(ply_dir)
        self.ply_threshold = ply_threshold
        self.indent = 0
        self.n_ply = 0
        self.warnings = []

    # -- emit helpers -------------------------------------------------------

    def _p(self, line):
        self.out.write("    " * self.indent + line + "\n")

    def _emit_params(self, params):
        for ty, name, vals in params.items:
            body = " ".join(_fmt_value(v) for v in vals)
            self._p(f'    "{ty} {name}" [ {body} ]')

    def warn(self, msg):
        self.warnings.append(msg)
        print(f"formatter warning: {msg}", file=sys.stderr)

    # -- upgrade rules ------------------------------------------------------

    def _rgb_to_scale(self, params, name):
        """v3 rgb scale -> scalar factor; returns multiplier or None on a
        non-uniform rgb (parser.cpp upgradeRGBToScale)."""
        it = params.get(name)
        if it is None or it[0] not in ("rgb", "color"):
            return 1.0
        v = it[2]
        if len(v) == 3 and v[0] == v[1] == v[2]:
            params.remove(name)
            return float(v[0])
        return None

    def _upgrade_blackbody(self, params, name):
        """v3 "blackbody" took [temperature scale]; v4 takes temperature only
        (ParameterDictionary::UpgradeBlackbody)."""
        it = params.get(name)
        if it and it[0] == "blackbody" and len(it[2]) == 2:
            scale = float(it[2][1])
            it[2] = [it[2][0]]
            return scale
        return 1.0

    def _remove_if_constant(self, params, name, value):
        it = params.get(name)
        if it is None:
            return False
        if it[0] in ("rgb", "color") and all(v == value for v in it[2]):
            params.remove(name)
            return True
        if it[0] != "texture":
            self.warn(f"parameter removed when upgrading: {name}")
        params.remove(name)
        return False

    def _upgrade_material(self, name, params):
        """parser.cpp:1457 upgradeMaterial. Returns the new material name."""
        params.rename("bumpmap", "displacement")
        # index -> eta (glass/uber)
        if name in ("glass", "uber"):
            it = params.remove("index")
            if it is not None:
                params.add(it[0], "eta", it[2])
        if name == "uber":
            new = "coateddiffuse"
            if self._remove_if_constant(params, "Ks", 0):
                new = "diffuse"
                params.remove("eta")
                params.remove("roughness")
            self._remove_if_constant(params, "Kr", 0)
            self._remove_if_constant(params, "Kt", 0)
            params.rename("Kd", "reflectance")
            params.remove("opacity")
            return new
        if name == "mix":
            it = params.get("amount")
            if it and it[0] in ("rgb", "color"):
                avg = float(np.mean(it[2]))
                params.remove("amount")
                params.add("float", "amount", [avg])
            m1 = params.remove("namedmaterial1")
            m2 = params.remove("namedmaterial2")
            if m1 and m2:
                # note: swapped order vs pbrt-v3 (parser.cpp:1545)
                params.add("string", "materials", [m2[2][0], m1[2][0]])
            else:
                self.warn('"mix" material missing namedmaterial1/2')
            return "mix"
        if name == "substrate":
            self._remove_if_constant(params, "Ks", 1)
            params.rename("Kd", "reflectance")
            return "coateddiffuse"
        if name == "glass":
            self._remove_if_constant(params, "Kr", 1)
            self._remove_if_constant(params, "Kt", 1)
            return "dielectric"
        if name == "plastic":
            new = "coateddiffuse"
            if self._remove_if_constant(params, "Ks", 0):
                new = "diffuse"
                params.remove("roughness")
                params.remove("eta")
            params.rename("Kd", "reflectance")
            return new
        if name == "fourier":
            self.warn('"fourier" material is no longer supported '
                      '(but there is "measured"!)')
            return name
        if name == "kdsubsurface":
            params.rename("Kd", "reflectance")
            return "subsurface"
        if name == "matte":
            params.rename("Kd", "reflectance")
            params.remove("sigma")
            return "diffuse"
        if name == "metal":
            self._remove_if_constant(params, "Kr", 1)
            return "conductor"
        if name == "translucent":
            params.rename("Kd", "transmittance")
            self._remove_if_constant(params, "reflect", 0)
            self._remove_if_constant(params, "transmit", 1)
            self._remove_if_constant(params, "Ks", 0)
            params.remove("roughness")
            return "diffusetransmission"
        if name == "mirror":
            self._remove_if_constant(params, "Kr", 0)
            params.add("float", "roughness", [0.0])
            params.add("spectrum", "eta", ["metal-Ag-eta"])
            params.add("spectrum", "k", ["metal-Ag-k"])
            return "conductor"
        if name == "disney":
            params.rename("color", "reflectance")
            return "diffuse"
        if name == "hair":
            params.rename("color", "reflectance")
            return "hair"
        if name in ("", "none"):
            return "interface"
        return name

    def _upgrade_light(self, name, params):
        total_scale = self._rgb_to_scale(params, "scale")
        if total_scale is None:
            self.warn('light "scale" is non-uniform rgb; edit manually')
            total_scale = 1.0
        params.remove("samples")
        params.remove("nsamples")
        total_scale *= self._upgrade_blackbody(params, "I")
        total_scale *= self._upgrade_blackbody(params, "L")
        it = params.remove("mapname")
        if it is not None:
            params.add("string", "filename", it[2])
        if total_scale != 1.0:
            old = params.remove("scale")
            if old is not None:
                total_scale *= float(old[2][0])
            params.add("float", "scale", [total_scale])
        return params

    def _upgrade_shape_uvs(self, params):
        """float "uv"/"st" arrays -> "point2 uv" (parser.cpp:1791)."""
        for nm in ("st", "uv"):
            it = params.get(nm)
            if it and it[0] in ("float", "point2"):
                params.remove(nm)
                params.add("point2", "uv", it[2])
                return

    # -- toply --------------------------------------------------------------

    def _maybe_extract_ply(self, params):
        idx = params.get("indices")
        P = params.get("P")
        if idx is None or P is None or len(idx[2]) < 3 * self.ply_threshold:
            return None
        from . import plyio
        v = np.asarray(P[2], np.float32).reshape(-1, 3)
        f = np.asarray(idx[2], np.int32).reshape(-1, 3)
        N = params.get("N")
        uv = params.get("uv") or params.get("st")
        fname = self.ply_dir / f"mesh_{self.n_ply:05d}.ply"
        self.n_ply += 1
        plyio.write_ply(
            str(fname), v, f,
            normals=None if N is None else
            np.asarray(N[2], np.float32).reshape(-1, 3),
            uvs=None if uv is None else
            np.asarray(uv[2], np.float32).reshape(-1, 2))
        kept = _Params()
        for ty, name, vals in params.items:
            if name not in ("indices", "P", "N", "uv", "st", "faceIndices"):
                kept.add(ty, name, vals)
        kept.add("string", "filename", [str(fname)])
        return kept

    # -- main loop ----------------------------------------------------------

    def format_tokens(self, toks):
        pos = 0
        while pos < len(toks):
            tok = toks[pos]
            if not isinstance(tok, str) or tok not in _DIRECTIVES:
                self.warn(f"unexpected token {tok!r}; skipping")
                pos += 1
                continue
            name, args, params, pos = _read_directive(toks, pos)
            self.emit(name, args, params)

    def emit(self, name, args, params):
        up = self.upgrade
        if name in ("AttributeEnd", "ObjectEnd", "TransformEnd"):
            self.indent = max(0, self.indent - 1)
        if name == "WorldEnd":
            if up:
                return  # removed in pbrt-v4
            self._p("WorldEnd")
            return
        if up and name == "Texture":
            tname, ttype, tclass = args
            if ttype == "color":
                ttype = "spectrum"
            if tclass == "scale":
                params.rename("tex1", "tex")
                it = params.get("tex2")
                if it is not None:
                    if it[0] in ("rgb", "color"):
                        if it[2][0] == it[2][1] == it[2][2]:
                            params.remove("tex2")
                            params.add("float", "scale", [float(it[2][0])])
                        else:
                            self.warn(f'non-constant rgb "tex2" in scale '
                                      f'texture "{tname}"; edit manually')
                    else:
                        params.rename("tex2", "scale")
            if tclass in ("imagemap", "ptex"):
                it = params.remove("trilinear")
                if it is not None:
                    params.add("string", "filter",
                               ["trilinear" if it[2][0] else "bilinear"])
                it = params.remove("gamma")
                if it is not None:
                    if it[0] == "float":
                        params.add("string", "encoding",
                                   [f"gamma {it[2][0]:g}"])
                    else:
                        params.add("string", "encoding",
                                   ["sRGB" if it[2][0] else "linear"])
            args = [tname, ttype, tclass]
        if up and name == "Material":
            args = [self._upgrade_material(args[0] if args else "", params)]
        if up and name == "MakeNamedMaterial":
            it = params.remove("type")
            mat = self._upgrade_material(it[2][0] if it else "", params)
            params.items.insert(0, ["string", "type", [mat]])
        if up and name in ("LightSource", "AreaLightSource"):
            if name == "AreaLightSource" and args[0] == "area":
                args = ["diffuse"]
            params = self._upgrade_light(args[0], params)
        if name == "Shape":
            if up and args[0] == "trianglemesh":
                self._upgrade_shape_uvs(params)
            if self.toply and args[0] == "trianglemesh":
                kept = self._maybe_extract_ply(params)
                if kept is not None:
                    args = ["plymesh"]
                    params = kept

        # print the directive
        if name in _XFORM_ARGS:
            self._p(name + " " + " ".join(_fmt_value(a) for a in args))
        elif args:
            self._p(name + " " + " ".join(f'"{a}"' for a in args))
        else:
            self._p(name)
        self._emit_params(params)
        if name in ("AttributeBegin", "ObjectBegin", "TransformBegin"):
            self.indent += 1


def format_file(path, out=None, upgrade=False, toply=False, ply_dir=None):
    text = Path(path).read_bytes()
    toks, _ = tokenize_with_offsets(text)
    f = Formatter(upgrade=upgrade, toply=toply, out=out,
                  ply_dir=ply_dir or Path(path).parent)
    f.format_tokens(toks)
    return f


def format_string(text, out=None, upgrade=False, toply=False, ply_dir="."):
    if isinstance(text, str):
        text = text.encode()
    toks, _ = tokenize_with_offsets(text)
    f = Formatter(upgrade=upgrade, toply=toply, out=out, ply_dir=ply_dir)
    f.format_tokens(toks)
    return f
