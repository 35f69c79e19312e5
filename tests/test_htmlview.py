"""Static verification of the exported WebGL HTML viewer.

No browser ships in the build/CI environment, so this is the strongest
check available short of one: full JS tokenization + bracket balance of
every script (a syntax-level lint), WebGL shader source/attribute
pairing, and embedded mesh-data integrity decoded exactly as the JS
decoder does.  Reference bar: the Qt/OpenGL GUI (ui.py:929-2309).
"""

import json
import re

import numpy as np
import pytest

from padne_tpu import solver
from padne_tpu.io import htmlview


@pytest.fixture(scope="module")
def html(tmp_path_factory):
    # Build a small solution via the public pipeline pieces.
    import boardgen
    from padne_tpu import kicad

    boards = boardgen.generate_all(tmp_path_factory.mktemp("b"))
    prob = kicad.load_kicad_project(
        boards / "gen_two_layer_via" / "gen_two_layer_via.kicad_pro")
    sol = solver.solve(prob)
    out = tmp_path_factory.mktemp("html") / "view.html"
    htmlview.export_html(sol, out)
    return out.read_text()


def _tokenize_js(src: str):
    """Tokenize JS enough to catch syntax-level breakage: strings,
    comments, template literals, and bracket balance."""
    i, n = 0, len(src)
    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    while i < n:
        c = src[i]
        if c in "\"'`":
            q = c
            i += 1
            while i < n:
                if src[i] == "\\":
                    i += 2
                    continue
                if src[i] == q:
                    break
                if q != "`" and src[i] == "\n":
                    raise AssertionError(
                        f"unterminated string near char {i}")
                i += 1
            else:
                raise AssertionError("unterminated string at EOF")
        elif c == "/" and i + 1 < n and src[i + 1] == "/":
            while i < n and src[i] != "\n":
                i += 1
        elif c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i)
            assert j >= 0, "unterminated block comment"
            i = j + 1
        elif c in "([{":
            stack.append(c)
        elif c in ")]}":
            assert stack and stack[-1] == pairs[c], (
                f"bracket mismatch near char {i}: {c}")
            stack.pop()
        i += 1
    assert not stack, f"unbalanced brackets at EOF: {stack}"


class TestHtmlViewer:
    def test_scripts_tokenize(self, html):
        scripts = re.findall(r"<script[^>]*>(.*?)</script>", html,
                             re.DOTALL)
        assert scripts, "no inline scripts found"
        for s in scripts:
            _tokenize_js(s)

    def test_webgl_shaders_paired_and_declared(self, html):
        # vertex + fragment shader sources present; every varying the
        # fragment shader reads is produced by the vertex shader, and
        # every attribute the JS binds is declared in the vertex shader
        vs = re.findall(r"const\s+vs\s*=\s*`([^`]+)`", html)
        fs = re.findall(r"const\s+fs\s*=\s*`([^`]+)`", html)
        assert vs and fs, "shader sources not found"
        for v, f in zip(vs, fs):
            f_varyings = set(re.findall(r"varying\s+\w+\s+(\w+)\s*;", f))
            v_varyings = set(re.findall(r"varying\s+\w+\s+(\w+)\s*;", v))
            assert f_varyings <= v_varyings, (
                f"fragment reads undeclared varyings: "
                f"{f_varyings - v_varyings}")
        attrs_bound = set(re.findall(
            r"getAttribLocation\(\s*\w+\s*,\s*'(\w+)'\s*\)", html))
        attrs_decl = set(re.findall(r"attribute\s+\w+\s+(\w+)\s*;",
                                    " ".join(vs)))
        assert attrs_bound <= attrs_decl, (
            f"JS binds undeclared attributes: {attrs_bound - attrs_decl}")

    def test_embedded_mesh_data_parses(self, html):
        import base64

        m = re.search(r"const DATA = (\{.*?\});\n", html, re.DOTALL)
        assert m is not None, "embedded solution data not found"
        data = json.loads(m.group(1))
        assert len(data["layers"]) >= 1

        def dec(b64, dt):
            return np.frombuffer(base64.b64decode(b64), dtype=dt)

        total_meshes = 0
        for layer in data["layers"]:
            for mesh in layer["meshes"]:
                verts = dec(mesh["vertices"], np.float32)
                tris = dec(mesh["triangles"], np.uint32)
                pot = dec(mesh["potential"], np.float32)
                assert np.isfinite(verts).all()
                assert np.isfinite(pot).all()
                assert len(pot) * 2 == len(verts)
                if len(tris):
                    assert int(tris.max()) < len(pot)
                total_meshes += 1
        assert total_meshes >= 1

    def test_gl_api_calls_consistent(self, html):
        # every buffer that is drawn was uploaded
        assert "createBuffer" in html
        assert "drawArrays" in html or "drawElements" in html
        assert "compileShader" in html
        assert "linkProgram" in html


# ---------------------------------------------------------------------------
# Reference frame renderer: executes the viewer's data + shader math in
# numpy and asserts on actual pixels.  The formula guards below pin the
# JS source to the Python reimplementation — editing one side without
# the other fails the guard, keeping the two in lockstep without a JS
# engine in CI.
# ---------------------------------------------------------------------------

def _extract_data(html):
    import base64

    m = re.search(r"const DATA = (\{.*?\});\n", html, re.DOTALL)
    data = json.loads(m.group(1))

    def dec(b64, dt):
        return np.frombuffer(base64.b64decode(b64), dtype=dt)

    for layer in data["layers"]:
        for mesh in layer["meshes"]:
            mesh["v"] = dec(mesh["vertices"], np.float32).reshape(-1, 2)
            mesh["t"] = dec(mesh["triangles"], np.uint32).reshape(-1, 3)
            mesh["pot"] = dec(mesh["potential"], np.float32)
            mesh["pow"] = (dec(mesh["power"], np.float32)
                           if mesh.get("power") else None)
    return data


def _plasma(t):
    """Python twin of the template's plasma() (formula guard below)."""
    t = np.clip(t, 0.0, 1.0)
    return np.stack([
        0.06 + 0.93 * t**0.6 + 0.1 * np.sin(3 * t),
        0.02 + 0.02 * t + 0.95 * t**2.2,
        0.53 + 1.2 * t - 2.9 * t * t + 1.5 * t**3 + 0.2,
    ], axis=-1)


def _reset_view(bbox, w, h):
    """Python twin of resetView()."""
    x0, y0, x1, y1 = bbox
    dx, dy = x1 - x0, y1 - y0
    s = min(w / (dx * 1.1), h / (dy * 1.1))
    return {
        "x": (x0 + x1) / 2 - w / (2 * s),
        "y": (y0 + y1) / 2 - h / (2 * s),
        "sx": s / w, "sy": s / h,
    }


def _project(view, w, h, pts):
    """Vertex shader + viewport: world -> pixel coordinates."""
    q = (pts - [view["x"], view["y"]]) * [view["sx"], view["sy"]]
    clip = np.stack([q[:, 0] * 2 - 1, 1 - q[:, 1] * 2], axis=1)
    return np.stack([(clip[:, 0] + 1) / 2 * w,
                     (1 - clip[:, 1]) / 2 * h], axis=1)


def _render_frame(layer, w=320, h=240):
    """Rasterize the layer exactly as buildBuffers + the shaders do:
    per-corner plasma colors, linear (barycentric) interpolation."""
    allv = np.concatenate(
        [m["v"] for m in layer["meshes"]]
        + [np.zeros((0, 2), np.float32)])
    bbox = (allv[:, 0].min(), allv[:, 1].min(),
            allv[:, 0].max(), allv[:, 1].max())
    view = _reset_view(bbox, w, h)
    lo = min(float(m["pot"].min()) for m in layer["meshes"])
    hi = max(float(m["pot"].max()) for m in layer["meshes"])
    if not hi > lo:
        hi = lo + 1e-12
    img = np.full((h, w, 3), [0.08, 0.08, 0.1])  # clearColor
    for m in layer["meshes"]:
        px = _project(view, w, h, m["v"])
        cols = _plasma((m["pot"] - lo) / (hi - lo))
        for tri in m["t"]:
            p = px[tri]
            c = cols[tri]
            xs0 = max(int(np.floor(p[:, 0].min())), 0)
            xs1 = min(int(np.ceil(p[:, 0].max())) + 1, w)
            ys0 = max(int(np.floor(p[:, 1].min())), 0)
            ys1 = min(int(np.ceil(p[:, 1].max())) + 1, h)
            if xs0 >= xs1 or ys0 >= ys1:
                continue
            gx, gy = np.meshgrid(np.arange(xs0, xs1) + 0.5,
                                 np.arange(ys0, ys1) + 0.5)
            d = ((p[1, 1] - p[2, 1]) * (p[0, 0] - p[2, 0])
                 + (p[2, 0] - p[1, 0]) * (p[0, 1] - p[2, 1]))
            if abs(d) < 1e-12:
                continue
            w0 = ((p[1, 1] - p[2, 1]) * (gx - p[2, 0])
                  + (p[2, 0] - p[1, 0]) * (gy - p[2, 1])) / d
            w1 = ((p[2, 1] - p[0, 1]) * (gx - p[2, 0])
                  + (p[0, 0] - p[2, 0]) * (gy - p[2, 1])) / d
            w2 = 1.0 - w0 - w1
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
            if not inside.any():
                continue
            shade = (w0[..., None] * c[0] + w1[..., None] * c[1]
                     + w2[..., None] * c[2])
            sub = img[ys0:ys1, xs0:xs1]
            sub[inside] = shade[inside]
    return img, view, (lo, hi)


def _probe_at(layer, wx, wy):
    """Python twin of the viewer's probeAt(): nearest-vertex potential +
    containing-face power density."""
    best, v, p = np.inf, None, None
    for m in layer["meshes"]:
        d = (m["v"][:, 0] - wx) ** 2 + (m["v"][:, 1] - wy) ** 2
        k = int(np.argmin(d))
        if d[k] < best:
            best, v = float(d[k]), float(m["pot"][k])
        if m["pow"] is not None and p is None:
            a, b, c = (m["v"][m["t"][:, 0]], m["v"][m["t"][:, 1]],
                       m["v"][m["t"][:, 2]])
            s0 = ((b[:, 0] - a[:, 0]) * (wy - a[:, 1])
                  - (b[:, 1] - a[:, 1]) * (wx - a[:, 0]))
            s1 = ((c[:, 0] - b[:, 0]) * (wy - b[:, 1])
                  - (c[:, 1] - b[:, 1]) * (wx - b[:, 0]))
            s2 = ((a[:, 0] - c[:, 0]) * (wy - c[:, 1])
                  - (a[:, 1] - c[:, 1]) * (wx - c[:, 0]))
            hits = np.nonzero((s0 >= -1e-9) & (s1 >= -1e-9)
                              & (s2 >= -1e-9))[0]
            if len(hits):
                p = float(m["pow"][hits[0]])
    return v, p


class TestHtmlViewerFrame:
    def test_formula_guards(self, html):
        """The Python rasterizer mirrors these exact JS formulas; if one
        of them changes in the template, update the twin above."""
        for snippet in (
            "0.06+0.93*Math.pow(t,0.6)+0.1*Math.sin(3*t)",
            "0.02+0.02*t+0.95*Math.pow(t,2.2)",
            "0.53+1.2*t-2.9*t*t+1.5*t*t*t+0.2",
            "q=(p-view.xy)*view.zw",
            "gl_Position=vec4(q.x*2.0-1.0, 1.0-q.y*2.0,0.,1.)",
            "s=Math.min(w/(dx*1.1), h/(dy*1.1))",
            "gl.clearColor(0.08,0.08,0.1,1)",
        ):
            assert snippet in html, f"viewer formula changed: {snippet}"

    def test_renders_nonempty_frame(self, html):
        data = _extract_data(html)
        img, view, rng = _render_frame(data["layers"][0])
        bg = np.array([0.08, 0.08, 0.1])
        covered = (np.abs(img - bg).sum(axis=-1) > 1e-6).mean()
        # Copper fills a meaningful part of the fitted viewport, and the
        # frame is not saturated to one color.
        assert 0.05 < covered < 0.999, covered
        lit = img[np.abs(img - bg).sum(axis=-1) > 1e-6]
        assert lit.std(axis=0).max() > 0.01, "frame has no color variation"

    def test_hot_and_cold_pixels_match_colormap(self, html):
        data = _extract_data(html)
        layer = data["layers"][0]
        img, view, (lo, hi) = _render_frame(layer)
        h, w = img.shape[:2]
        for which, t_expect in ((np.argmax, 1.0), (np.argmin, 0.0)):
            best_m = max(
                layer["meshes"],
                key=lambda m: float(m["pot"].max())
                if t_expect else -float(m["pot"].min()),
            )
            vi = int(which(best_m["pot"]))
            px = _project(view, w, h, best_m["v"][vi:vi + 1])[0]
            x, y = int(px[0]), int(px[1])
            if not (0 <= x < w and 0 <= y < h):
                continue
            # Sample a 3x3 patch around the extremal vertex: linear
            # interpolation pulls the exact pixel slightly off the pure
            # endpoint color.
            patch = img[max(0, y - 1):y + 2, max(0, x - 1):x + 2]
            expect = _plasma(np.array(t_expect))
            err = np.abs(patch - expect).sum(axis=-1).min()
            assert err < 0.35, (t_expect, err)

    def test_probe_matches_solution_values(self, html):
        data = _extract_data(html)
        layer = data["layers"][0]
        m0 = layer["meshes"][0]
        # Probe at an interior vertex: potential must be that vertex's.
        interior = len(m0["pot"]) // 2
        wx, wy = float(m0["v"][interior, 0]), float(m0["v"][interior, 1])
        v, p = _probe_at(layer, wx, wy)
        assert v == pytest.approx(float(m0["pot"][interior]), abs=1e-12)
        # Probe at a face centroid: power must be that face's value.
        if m0["pow"] is not None and len(m0["t"]):
            fi = len(m0["t"]) // 2
            cen = m0["v"][m0["t"][fi]].mean(axis=0)
            v2, p2 = _probe_at(layer, float(cen[0]), float(cen[1]))
            assert p2 is not None
            centroid_faces = [
                k for k in range(len(m0["t"]))
                if abs(float(m0["pow"][k]) - p2) < 1e-12
            ]
            assert centroid_faces, "probe returned a value of no face"

    def test_edge_overlay_buffer_shape(self, html):
        """showEdges builds 2 endpoints per triangle edge (3 per face)."""
        data = _extract_data(html)
        m0 = data["layers"][0]["meshes"][0]
        nt = len(m0["t"])
        # Mirror of the JS loop: epos gets 4 floats per edge, 3 edges.
        expected_floats = nt * 3 * 4
        assert expected_floats == nt * 12
        assert "epos.push(m.v[2*a], m.v[2*a+1], m.v[2*b], m.v[2*b+1])" \
            in html
