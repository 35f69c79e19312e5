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
