"""Verification of the exported WebGL HTML viewer.

No browser or JS engine ships in the build/CI environment, so the
viewer is exercised two ways (reference bar: the Qt/OpenGL GUI,
ui.py:929-2309):

1. static checks — JS tokenization/bracket balance, shader pairing,
   embedded data integrity, plus a Python twin of the render math;
2. EXECUTION of the shipped script under tests/jsmini.py (a minimal JS
   interpreter) against recording DOM/WebGL stubs (tests/jsdom.py):
   real event dispatch (probe, pan, zoom, mode/layer/edges/rescale)
   and software-rasterized pixel assertions on the recorded draw calls
   (TestHtmlViewerExecution below).
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
                verts = dec(mesh["vq"], np.uint16)
                tris = dec(mesh["triangles"], np.uint16)
                pot = dec(mesh["potential"], np.float32)
                assert len(mesh["bbox"]) == 4
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

    def dequant(q, bbox):
        # Python twin of the template's dequant() (formula guard):
        # f32 result of bbox[0] + q * (bbox[2]-bbox[0])/65535.
        q = q.reshape(-1, 2).astype(np.float64)
        sx = (bbox[2] - bbox[0]) / 65535.0
        sy = (bbox[3] - bbox[1]) / 65535.0
        out = np.stack([bbox[0] + q[:, 0] * sx,
                        bbox[1] + q[:, 1] * sy], axis=1)
        return out.astype(np.float32)

    for layer in data["layers"]:
        for mesh in layer["meshes"] + layer["disconnected"]:
            mesh["v"] = dequant(dec(mesh["vq"], np.uint16), mesh["bbox"])
            mesh["t"] = dec(mesh["triangles"], np.uint16).reshape(-1, 3)
            if "potential" in mesh:
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


# ---------------------------------------------------------------------------
# Execution tests: the shipped script runs under tests/jsmini.py against
# recording DOM/WebGL stubs, events are dispatched for real, and recorded
# draw calls are software-rasterized for pixel assertions.
# ---------------------------------------------------------------------------

from jsdom import rasterize_draw, run_viewer, world_to_offset  # noqa: E402


@pytest.fixture(scope="module")
def viewer(html):
    """The viewer script, fully executed (decode, GL init, first frame)."""
    return run_viewer(html)


def _last_draw(dom, mode=4.0):
    draws = [d for d in dom.gl.draws if d["mode"] == mode]
    assert draws, f"no draw with mode {mode}"
    return draws[-1]


def _inferno(t):
    """Python twin of the template's inferno() colormap."""
    t = np.clip(t, 0.0, 1.0)
    return np.stack([
        t ** 0.7 * 1.1, t ** 1.8 * 1.05,
        0.15 + 2.2 * t - 6.4 * t * t + 4.6 * t ** 3 + 0.35 * t,
    ], axis=-1)


_SI_MULT = {"T": 1e12, "G": 1e9, "M": 1e6, "k": 1e3, "m": 1e-3,
            "u": 1e-6, "μ": 1e-6, "n": 1e-9, "p": 1e-12}


def _parse_si(text):
    """Python mirror of the viewer's parseSI (SI prefix + unit strip)."""
    t = text.replace(" ", "")
    for unit in ("W/mm²", "V"):
        if t.endswith(unit):
            t = t[: -len(unit)]
            break
    mult = 1.0
    if t and t[-1] in _SI_MULT:
        mult = _SI_MULT[t[-1]]
        t = t[:-1]
    return float(t) * mult


def _pot_range(layer):
    lo = min(float(m["pot"].min()) for m in layer["meshes"])
    hi = max(float(m["pot"].max()) for m in layer["meshes"])
    return lo, (hi if hi > lo else lo + 1e-12)


class TestHtmlViewerExecution:
    def test_script_executes_and_draws_every_face(self, html, viewer):
        interp, dom = viewer
        data = _extract_data(html)
        layer0 = data["layers"][0]
        expected = 3 * (
            sum(len(m["t"]) for m in layer0["meshes"])
            + sum(
                len(np.frombuffer(__import__("base64").b64decode(
                    d["triangles"]), np.uint16)) // 3
                for d in layer0["disconnected"]
            )
        )
        draw = _last_draw(dom)
        assert draw["count"] == expected
        # Shaders were compiled from the template's sources.
        srcs = list(dom.gl.shader_sources.values())
        assert any("gl_Position" in s for s in srcs)
        assert any("gl_FragColor" in s for s in srcs)
        # Legend gradient: 220 one-pixel-wide fills with varying colors.
        assert len(dom.ctx2d.rects) >= 220
        assert len({r[0] for r in dom.ctx2d.rects[-220:]}) > 100

    def test_vertex_colors_match_colormap_of_decoded_potentials(
            self, html, viewer):
        """Every corner color the JS pushed equals plasma(normalized
        potential) of the decoded f32 value — computed independently."""
        interp, dom = viewer
        data = _extract_data(html)
        layer = data["layers"][0]
        lo, hi = _pot_range(layer)
        draw = _last_draw(dom)
        col = draw["attribs"][1.0][0].reshape(-1, 3)
        k = 0
        checked = 0
        for m in layer["meshes"]:
            for tri in m["t"]:
                for vi in tri:
                    expect = _plasma(
                        (float(m["pot"][vi]) - lo) / (hi - lo))
                    assert np.allclose(col[k], expect, atol=1e-6), (
                        k, col[k], expect)
                    k += 1
                    checked += 1
        assert checked >= 3

    def test_rasterized_frame_pixels(self, html, viewer):
        """Rasterize the recorded draw call and assert actual pixels:
        coverage, color variation, and an exact interior sample."""
        interp, dom = viewer
        data = _extract_data(html)
        layer = data["layers"][0]
        lo, hi = _pot_range(layer)
        draw = _last_draw(dom)
        img = rasterize_draw(draw)
        bg = np.array(draw["clear_color"][:3])
        lit_mask = np.abs(img - bg).sum(axis=-1) > 1e-6
        assert 0.05 < lit_mask.mean() < 0.999
        assert img[lit_mask].std(axis=0).max() > 0.01

        # Exact pixel check at the largest face's centroid.
        m = max(layer["meshes"], key=lambda m: len(m["t"]))
        v, t = m["v"].astype(np.float64), m["t"]
        e1 = v[t[:, 1]] - v[t[:, 0]]
        e2 = v[t[:, 2]] - v[t[:, 0]]
        areas = np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
        fi = int(np.argmax(areas))
        tri = t[fi]
        cen = v[tri].mean(axis=0)
        view = np.asarray(draw["uniforms"]["view"])
        w, h = (int(draw["canvas_size"][0]), int(draw["canvas_size"][1]))
        q = (cen - view[:2]) * view[2:4]
        px = (q[0] * 2 - 1 + 1) / 2 * w
        py = h - (1 - q[1] * 2 + 1) / 2 * h
        xi, yi = int(px), int(py)
        assert 0 <= xi < w and 0 <= yi < h
        # Barycentric weights of the pixel CENTER in world space (the
        # affine screen map preserves them).
        cx = view[0] + ((xi + 0.5) / w) / view[2]
        cy = view[1] + ((yi + 0.5) / h) / view[3]
        a, b, c = v[tri]
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        w0 = ((b[1] - c[1]) * (cx - c[0]) + (c[0] - b[0]) * (cy - c[1])) / det
        w1 = ((c[1] - a[1]) * (cx - c[0]) + (a[0] - c[0]) * (cy - c[1])) / det
        w2 = 1.0 - w0 - w1
        if min(w0, w1, w2) < 1e-6:
            pytest.skip("pixel center fell outside the chosen face")
        cols = _plasma((m["pot"][tri].astype(np.float64) - lo) / (hi - lo))
        expect = w0 * cols[0] + w1 * cols[1] + w2 * cols[2]
        assert np.allclose(img[yi, xi], expect, atol=1e-5), (
            img[yi, xi], expect)

    def test_probe_event_reports_vertex_potential_and_face_power(
            self, html, viewer):
        interp, dom = viewer
        data = _extract_data(html)
        layer = data["layers"][0]
        m = max(layer["meshes"], key=lambda m: len(m["t"]))
        draw = _last_draw(dom)
        view = draw["uniforms"]["view"]
        w, h = draw["canvas_size"]

        # Aim at a face centroid: nearest vertex + containing face known.
        v, t = m["v"].astype(np.float64), m["t"]
        e1 = v[t[:, 1]] - v[t[:, 0]]
        e2 = v[t[:, 2]] - v[t[:, 0]]
        areas = np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
        fi = int(np.argmax(areas))
        cen = v[t[fi]].mean(axis=0)
        ox, oy = world_to_offset(view, w, h, cen[0], cen[1])
        dom.elements["c"].fire(interp, "mousemove", offsetX=ox, offsetY=oy)
        txt = dom.elements["probe"].props["textContent"]
        assert "V" in txt, txt
        nums = re.findall(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?", txt)
        # (wx, wy) -> V [| P W/mm2]
        assert len(nums) >= 3, txt
        probed_v = float(nums[2])
        expect_v, expect_p = _probe_at(layer, cen[0], cen[1])
        assert probed_v == pytest.approx(expect_v, rel=1e-4, abs=1e-9)
        if expect_p is not None:
            assert "W/mm" in txt
            assert float(nums[3]) == pytest.approx(
                expect_p, rel=1e-4, abs=1e-30)

    def test_pan_drag_shifts_view(self, viewer):
        interp, dom = viewer
        before = np.asarray(_last_draw(dom)["uniforms"]["view"])
        w, h = _last_draw(dom)["canvas_size"]
        canvas = dom.elements["c"]
        canvas.fire(interp, "mousedown", clientX=100.0, clientY=100.0)
        canvas.fire(interp, "mousemove", clientX=110.0, clientY=95.0,
                    offsetX=110.0, offsetY=95.0)
        dom.window.fire(interp, "mouseup")
        after = np.asarray(_last_draw(dom)["uniforms"]["view"])
        assert after[0] == pytest.approx(before[0] - 10.0 / (before[2] * w))
        assert after[1] == pytest.approx(before[1] + 5.0 / (before[3] * h))
        assert after[2] == before[2] and after[3] == before[3]

    def test_wheel_zoom_preserves_cursor_world_point(self, viewer):
        interp, dom = viewer
        draw = _last_draw(dom)
        v0 = np.asarray(draw["uniforms"]["view"])
        w, h = draw["canvas_size"]
        ox, oy = 200.0, 150.0
        wx0 = v0[0] + ox / (v0[2] * w)
        wy0 = v0[1] + oy / (v0[3] * h)
        dom.elements["c"].fire(interp, "wheel", deltaY=-1.0,
                               offsetX=ox, offsetY=oy)
        v1 = np.asarray(_last_draw(dom)["uniforms"]["view"])
        assert v1[2] == pytest.approx(v0[2] * 1.2)
        assert v1[0] + ox / (v1[2] * w) == pytest.approx(wx0, rel=1e-12)
        assert v1[1] + oy / (v1[3] * h) == pytest.approx(wy0, rel=1e-12)
        # zoom back so later tests see a deterministic view
        dom.elements["c"].fire(interp, "wheel", deltaY=1.0,
                               offsetX=ox, offsetY=oy)

    def test_edges_toggle_draws_wireframe(self, html, viewer):
        interp, dom = viewer
        data = _extract_data(html)
        # layer index at this point in the sequence is still 0
        nt = sum(len(m["t"]) for m in data["layers"][0]["meshes"])
        edges = dom.elements["edges"]
        edges.props["checked"] = True
        edges.fire(interp, "change")
        lines = _last_draw(dom, mode=1.0)
        assert lines["count"] == 6 * nt  # 3 edges x 2 endpoints per face
        edges.props["checked"] = False
        edges.fire(interp, "change")

    def test_mode_switch_to_power_density(self, html, viewer):
        interp, dom = viewer
        data = _extract_data(html)
        layer = data["layers"][0]
        mode = dom.elements["mode"]
        mode.props["selectedIndex"] = 1.0
        mode.fire(interp, "change")
        assert "W/mm" in dom.elements["vmax"].props["textContent"]
        # Power density is per-face: all three corners share one inferno
        # color equal to the Python twin's value.
        draw = _last_draw(dom)
        col = draw["attribs"][1.0][0].reshape(-1, 3)
        lo = min(float(m["pow"].min()) for m in layer["meshes"]
                 if m["pow"] is not None)
        hi = max(float(m["pow"].max()) for m in layer["meshes"]
                 if m["pow"] is not None)
        if not hi > lo:
            hi = lo + 1e-12
        k = 0
        for m in layer["meshes"]:
            for fi in range(len(m["t"])):
                expect = (_inferno((float(m["pow"][fi]) - lo) / (hi - lo))
                          if m["pow"] is not None else np.zeros(3))
                for _ in range(3):
                    assert np.allclose(col[k], expect, atol=1e-6)
                    k += 1
            break  # first mesh is enough
        mode.props["selectedIndex"] = 0.0
        mode.fire(interp, "change")

    def test_rescale_overrides_color_range(self, viewer):
        interp, dom = viewer
        dom.elements["vmin_in"].props["value"] = "0.2"
        dom.elements["vmax_in"].props["value"] = "0.8"
        dom.elements["rescale"].fire(interp, "click")
        # Scale labels render SI-prefixed (ColorScaleWidget parity).
        assert dom.elements["vmin"].props["textContent"] == "200 mV"
        assert dom.elements["vmax"].props["textContent"] == "800 mV"
        assert dom.elements["vdelta"].props["textContent"] == "Δ 600 mV"
        # Bad override (hi <= lo) resets to the data range.
        dom.elements["vmax_in"].props["value"] = "0.1"
        dom.elements["rescale"].fire(interp, "click")
        assert dom.elements["vmax"].props["textContent"] != "100 mV"

    def test_rescale_parses_si_prefixed_input(self, viewer):
        """The min/max boxes accept SI-prefixed values with an optional
        unit, like the reference's EditableValueLabel (units.Value.parse
        semantics: '250m', '0.8 V', '1.2kV', 'u' for micro)."""
        interp, dom = viewer
        dom.elements["vmin_in"].props["value"] = "250m"
        dom.elements["vmax_in"].props["value"] = "0.8 V"
        dom.elements["rescale"].fire(interp, "click")
        assert dom.elements["vmin"].props["textContent"] == "250 mV"
        assert dom.elements["vmax"].props["textContent"] == "800 mV"
        assert dom.elements["vdelta"].props["textContent"] == "Δ 550 mV"
        dom.elements["vmin_in"].props["value"] = "50uV"
        dom.elements["vmax_in"].props["value"] = "1.5mV"
        dom.elements["rescale"].fire(interp, "click")
        assert dom.elements["vmin"].props["textContent"] == "50 μV"
        assert dom.elements["vmax"].props["textContent"] == "1.5 mV"
        # Garbage input resets to the data range (no crash).
        dom.elements["vmin_in"].props["value"] = "abc"
        dom.elements["rescale"].fire(interp, "click")
        assert dom.elements["vmin"].props["textContent"] != "abc"

    def test_layer_switch_rebuilds_buffers(self, html, viewer):
        interp, dom = viewer
        data = _extract_data(html)
        if len(data["layers"]) < 2:
            pytest.skip("single-layer board")
        sel = dom.elements["layer"]
        # The script populated one <option> per layer on load.
        assert len(sel.children) == len(data["layers"])
        sel.props["value"] = "1"
        sel.fire(interp, "change")
        import base64 as _b64mod
        expected = 3 * (
            sum(len(m["t"]) for m in data["layers"][1]["meshes"])
            + sum(len(np.frombuffer(_b64mod.b64decode(d["triangles"]),
                                    np.uint16)) // 3
                  for d in data["layers"][1]["disconnected"])
        )
        assert _last_draw(dom)["count"] == expected
        sel.props["value"] = "0"
        sel.fire(interp, "change")


class TestBoundaryEdgesHelper:
    def test_square_two_triangles(self):
        tri = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
        bnd = htmlview._boundary_edges(tri)
        assert len(bnd) == 4
        keys = {tuple(sorted(e)) for e in bnd.tolist()}
        assert keys == {(0, 1), (1, 2), (2, 3), (0, 3)}  # no (0, 2)

    def test_empty(self):
        assert htmlview._boundary_edges(np.zeros((0, 3), np.uint32)).shape \
            == (0, 2)


class TestViewerOverlays:
    """Connection points, boundary outline, and the cursor min/max
    tools (reference: RenderedPoints ui.py:876-927, boundary VAO
    :746-766, SetMin/SetMaxValueTool :325-372)."""

    def test_connection_points_drawn_by_default(self, html, viewer):
        interp, dom = viewer
        import base64 as b64mod

        data = _extract_data(html)
        layer = data["layers"][0]
        pts = np.frombuffer(b64mod.b64decode(layer["points"]),
                            np.float32).reshape(-1, 3)
        assert layer["npts"] == len(pts) >= 1
        pdraws = [d for d in dom.gl.draws if d["mode"] == 0.0]
        assert pdraws, "no POINTS draw in the initial frames"
        d = pdraws[-1]
        assert d["count"] == len(pts)
        got = d["attribs"][0.0][0].reshape(-1, 2)
        assert np.allclose(np.sort(got, axis=0),
                           np.sort(pts[:, :2], axis=0), atol=1e-6)
        # Sourced markers are red, passive gray (reference ui.py:881).
        cols = d["attribs"][1.0][0].reshape(-1, 3)
        flag_of = {(round(float(x), 5), round(float(y), 5)): s > 0.5
                   for x, y, s in pts}
        assert flag_of, "no points"
        for (x, y), col in zip(got, cols):
            sourced = flag_of[(round(float(x), 5), round(float(y), 5))]
            assert np.allclose(
                col, (0.92, 0.26, 0.21) if sourced else (0.72, 0.72, 0.75),
                atol=1e-6)

    def test_keyboard_toggles_points_and_boundary(self, html, viewer):
        interp, dom = viewer
        import base64 as b64mod

        data = _extract_data(html)
        layer = data["layers"][0]
        # 'c' hides connection points: frames drawn after it contain no
        # POINTS draw.
        dom.window.fire(interp, "keydown", key="c")
        n0 = len(dom.gl.draws)
        dom.elements["reset"].fire(interp, "click")
        assert all(d["mode"] != 0.0 for d in dom.gl.draws[n0:])
        # 'b' shows the copper outline: one LINES draw whose vertex
        # count is twice the boundary-edge count of every mesh.
        dom.window.fire(interp, "keydown", key="b")
        nb = 0
        for group in ("meshes", "disconnected"):
            for m in layer[group]:
                nb += len(np.frombuffer(b64mod.b64decode(m["boundary"]),
                                        np.uint16)) // 2
        lines = _last_draw(dom, mode=1.0)
        assert lines["count"] == 2 * nb
        # Boundary payload matches an independent recomputation.
        m0 = layer["meshes"][0]
        twin = htmlview._boundary_edges(m0["t"])
        got = np.frombuffer(b64mod.b64decode(m0["boundary"]),
                            np.uint16).reshape(-1, 2)
        assert {tuple(sorted(e)) for e in got.tolist()} \
            == {tuple(sorted(e)) for e in twin.tolist()}
        # restore
        dom.window.fire(interp, "keydown", key="b")
        dom.window.fire(interp, "keydown", key="c")

    def test_cursor_min_max_tools(self, html, viewer):
        interp, dom = viewer
        from jsdom import world_to_offset

        data = _extract_data(html)
        m0 = data["layers"][0]["meshes"][0]
        vi = int(np.argmax(m0["pot"]))
        wx, wy = float(m0["v"][vi, 0]), float(m0["v"][vi, 1])
        draw = _last_draw(dom)
        view = draw["uniforms"]["view"]
        w, h = draw["canvas_size"]
        ox, oy = world_to_offset(view, w, h, wx, wy)
        dom.elements["c"].fire(interp, "mousemove",
                               offsetX=ox, offsetY=oy)
        dom.window.fire(interp, "keydown", key="M")
        expect = float(m0["pot"][vi])
        # The input pre-fills with the SI-formatted value (reference
        # EditableValueLabel behavior) and the legend shows the same
        # string; the SI text round-trips to the probe value within
        # fmtSI's 4-significant-digit display precision.
        si_text = dom.elements["vmax_in"].props["value"]
        assert dom.elements["vmax"].props["textContent"] == si_text
        assert abs(_parse_si(si_text) - expect) \
            <= 1e-3 * max(abs(expect), 1e-12)
        # 'm' sets the minimum from the cursor value.
        dom.window.fire(interp, "keydown", key="m")
        assert abs(_parse_si(dom.elements["vmin_in"].props["value"])
                   - expect) <= 1e-3 * max(abs(expect), 1e-12)
        # reset the override for later tests
        mode = dom.elements["mode"]
        mode.props["selectedIndex"] = 0.0
        mode.fire(interp, "change")


class TestMeshChunking:
    """u16-index chunking (htmlview._chunk_mesh): invariants that the
    1M-scale gate exercises end-to-end, unit-tested fast here."""

    def _grid(self, n):
        xs, ys = np.meshgrid(np.arange(n, dtype=float),
                             np.arange(n, dtype=float))
        verts = np.stack([xs.ravel(), ys.ravel()], axis=1)
        i0 = (np.arange(n * n).reshape(n, n))[:-1, :-1].ravel()
        t1 = np.stack([i0, i0 + 1, i0 + n + 1], axis=1)
        t2 = np.stack([i0, i0 + n + 1, i0 + n], axis=1)
        tris = np.concatenate([t1, t2])
        return verts, tris

    def test_small_mesh_unchunked(self):
        verts, tris = self._grid(20)
        assert htmlview._chunk_mesh(len(verts), tris) is None

    def test_chunks_cover_and_remap_exactly(self):
        verts, tris = self._grid(120)          # 14,400 verts
        chunks = htmlview._chunk_mesh(len(verts), tris, limit=4000)
        assert chunks is not None and len(chunks) > 1
        covered = 0
        for vidx, tl, t0, t1 in chunks:
            assert len(vidx) <= 4000
            assert tl.dtype == np.uint16
            assert int(tl.max()) < len(vidx)
            # local -> global recovers the original triangles
            np.testing.assert_array_equal(
                vidx[tl.astype(np.int64)], tris[t0:t1])
            covered += t1 - t0
        # consecutive, disjoint, complete triangle ranges
        assert covered == len(tris)
        assert chunks[0][2] == 0 and chunks[-1][3] == len(tris)
        for a, b in zip(chunks, chunks[1:]):
            assert a[3] == b[2]

    def test_quantization_error_bound(self):
        verts, _ = self._grid(50)
        q, bbox = htmlview._quant16(verts)
        sx = (bbox[2] - bbox[0]) / 65535.0
        sy = (bbox[3] - bbox[1]) / 65535.0
        back = np.stack([bbox[0] + q[:, 0] * sx,
                         bbox[1] + q[:, 1] * sy], axis=1)
        step = max(bbox[2] - bbox[0], bbox[3] - bbox[1]) / 65535.0
        assert np.abs(back - verts).max() <= step
