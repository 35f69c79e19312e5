"""Recording DOM + WebGL stubs for executing the exported HTML viewer.

Paired with tests/jsmini.py: the viewer's shipped <script> runs against
these stubs, which record every GL call with enough state (buffer
snapshots, attribute bindings, uniforms, viewport) to software-rasterize
each drawArrays() afterwards and assert on actual pixels.
"""

from __future__ import annotations

import re

import numpy as np

from jsmini import Interp, JSArray, JSObject, JSTypedArray, UNDEF, to_number


class Element(JSObject):
    """Minimal DOM element: property bag + event listeners + children."""

    def __init__(self, dom, tag="div"):
        super().__init__()
        self.tag = tag
        self.listeners = {}
        self.children = []
        self.props.update({
            "addEventListener": self._add_listener,
            "appendChild": self._append_child,
            "textContent": "",
            "value": "",
            "checked": False,
        })
        self._dom = dom

    def _add_listener(self, name, fn, *_opts):
        self.listeners.setdefault(name, []).append(fn)
        return UNDEF

    def _append_child(self, child):
        self.children.append(child)
        return child

    def fire(self, interp: Interp, name: str, **props):
        """Dispatch an event to this element's listeners."""
        ev = JSObject({
            "target": self,
            "preventDefault": lambda: UNDEF,
            **{k: v for k, v in props.items()},
        })
        for fn in self.listeners.get(name, []):
            interp.call_function(fn, [ev])
        return ev


class Context2D:
    """Canvas 2D recording stub (used by the legend gradient)."""

    def __init__(self):
        self.rects = []  # (fillStyle, x, y, w, h)
        self.obj = JSObject({"fillStyle": ""})
        self.obj.props["fillRect"] = self._fill_rect

    def _fill_rect(self, x, y, w, h):
        self.rects.append((self.obj.props["fillStyle"],
                           to_number(x), to_number(y),
                           to_number(w), to_number(h)))
        return UNDEF


_GL_CONSTANTS = {
    "VERTEX_SHADER": 35633.0,
    "FRAGMENT_SHADER": 35632.0,
    "ARRAY_BUFFER": 34962.0,
    "ELEMENT_ARRAY_BUFFER": 34963.0,
    "STATIC_DRAW": 35044.0,
    "DYNAMIC_DRAW": 35048.0,
    "FLOAT": 5126.0,
    "TRIANGLES": 4.0,
    "LINES": 1.0,
    "POINTS": 0.0,
    "COLOR_BUFFER_BIT": 16384.0,
    "DEPTH_BUFFER_BIT": 256.0,
    "COMPILE_STATUS": 35713.0,
    "LINK_STATUS": 35714.0,
}


class GLRecorder:
    """WebGL 1 recording stub.

    Draw calls are recorded with deep snapshots of the bound attribute
    buffers and the uniform values at call time, so frames can be
    re-rasterized after the script finishes.
    """

    def __init__(self, canvas: Element):
        self.canvas = canvas
        self.buffers = {}          # handle -> np.ndarray (latest upload)
        self.shader_sources = {}   # handle -> source text
        self.attached = []         # (program, shader) pairs
        self.attrib_names = {}     # name -> location
        self.attribs = {}          # location -> (buffer_handle, size)
        self.enabled = set()
        self.uniforms = {}         # uniform name -> tuple
        self.viewport_rect = None
        self.clear_color = (0.0, 0.0, 0.0, 0.0)
        self.clears = 0
        self.draws = []            # recorded draw dicts
        self._next_handle = 1.0
        self._next_loc = 0.0

        g = {name: val for name, val in _GL_CONSTANTS.items()}
        g.update({
            "createShader": self._create_handle,
            "shaderSource": self._shader_source,
            "compileShader": lambda s: UNDEF,
            "getShaderParameter": lambda s, p: True,
            "createProgram": self._create_handle,
            "attachShader": lambda p, s: self.attached.append((p, s)),
            "linkProgram": lambda p: UNDEF,
            "getProgramParameter": lambda p, q: True,
            "useProgram": lambda p: UNDEF,
            "getAttribLocation": self._get_attrib_location,
            "getUniformLocation": lambda p, name: str(name),
            "createBuffer": self._create_handle,
            "bindBuffer": self._bind_buffer,
            "bufferData": self._buffer_data,
            "enableVertexAttribArray": lambda loc: self.enabled.add(
                to_number(loc)),
            "vertexAttribPointer": self._vertex_attrib_pointer,
            "uniform4f": self._uniform4f,
            "uniform2f": lambda loc, a, b: self.uniforms.__setitem__(
                str(loc), (to_number(a), to_number(b))),
            "uniform1f": lambda loc, a: self.uniforms.__setitem__(
                str(loc), (to_number(a),)),
            "viewport": self._viewport,
            "clearColor": self._clear_color,
            "clear": self._clear,
            "drawArrays": self._draw_arrays,
        })
        self.obj = JSObject(g)
        self._bound = None

    def _create_handle(self, *_a):
        h = self._next_handle
        self._next_handle += 1.0
        return h

    def _shader_source(self, handle, src):
        self.shader_sources[handle] = str(src)
        return UNDEF

    def _get_attrib_location(self, _prog, name):
        name = str(name)
        if name not in self.attrib_names:
            self.attrib_names[name] = self._next_loc
            self._next_loc += 1.0
        return self.attrib_names[name]

    def _bind_buffer(self, _target, handle):
        self._bound = handle
        return UNDEF

    def _buffer_data(self, _target, data, _usage):
        if not isinstance(data, JSTypedArray):
            raise AssertionError("bufferData expects a typed array")
        self.buffers[self._bound] = data.arr.copy()
        return UNDEF

    def _vertex_attrib_pointer(self, loc, size, _type, _norm, _stride, _off):
        self.attribs[to_number(loc)] = (self._bound, int(to_number(size)))
        return UNDEF

    def _uniform4f(self, loc, a, b, c, d):
        self.uniforms[str(loc)] = (to_number(a), to_number(b),
                                   to_number(c), to_number(d))
        return UNDEF

    def _viewport(self, x, y, w, h):
        self.viewport_rect = (int(to_number(x)), int(to_number(y)),
                              int(to_number(w)), int(to_number(h)))
        return UNDEF

    def _clear_color(self, r, g, b, a):
        self.clear_color = (to_number(r), to_number(g),
                            to_number(b), to_number(a))
        return UNDEF

    def _clear(self, _mask):
        self.clears += 1
        return UNDEF

    def _draw_arrays(self, mode, first, count):
        snapshot = {}
        for loc, (handle, size) in self.attribs.items():
            if loc in self.enabled and handle in self.buffers:
                snapshot[loc] = (self.buffers[handle].copy(), size)
        self.draws.append({
            "mode": to_number(mode),
            "first": int(to_number(first)),
            "count": int(to_number(count)),
            "attribs": snapshot,
            "uniforms": dict(self.uniforms),
            "viewport": self.viewport_rect,
            "clear_color": self.clear_color,
            "canvas_size": (to_number(self.canvas.props["width"]),
                            to_number(self.canvas.props["height"])),
        })
        return UNDEF


class ViewerDom:
    """The document/window pair the htmlview template expects."""

    ELEMENT_IDS = ("layer", "mode", "edges", "boundary", "points",
                   "vmin_in", "vmax_in", "rescale", "reset", "vmin",
                   "vmax", "vdelta", "probe")

    def __init__(self, width=640, height=480):
        self.elements = {}
        for el_id in self.ELEMENT_IDS:
            self.elements[el_id] = Element(self, el_id)
        self.elements["mode"].props["selectedIndex"] = 0.0

        canvas = Element(self, "canvas")
        canvas.props.update({
            "width": 0.0, "height": 0.0,
            "clientWidth": float(width), "clientHeight": float(height),
        })
        self.gl = GLRecorder(canvas)
        canvas.props["getContext"] = (
            lambda kind: self.gl.obj if str(kind) == "webgl"
            else (_ for _ in ()).throw(AssertionError(kind)))
        self.elements["c"] = canvas

        grad = Element(self, "canvas")
        grad.props.update({"width": 220.0, "height": 12.0})
        self.ctx2d = Context2D()
        grad.props["getContext"] = (
            lambda kind: self.ctx2d.obj if str(kind) == "2d"
            else (_ for _ in ()).throw(AssertionError(kind)))
        self.elements["grad"] = grad

        self.document = JSObject({
            "getElementById": lambda i: self.elements[str(i)],
            "createElement": lambda tag: Element(self, str(tag)),
        })
        self.window = Element(self, "window")

    def globals(self):
        return {"document": self.document, "window": self.window}


def run_viewer(html: str, width=640, height=480):
    """Execute the viewer script embedded in an exported HTML file.

    Returns (interp, dom); dom.gl.draws holds the recorded frames.
    """
    scripts = re.findall(r"<script[^>]*>(.*?)</script>", html, re.DOTALL)
    assert scripts, "no inline scripts in exported HTML"
    dom = ViewerDom(width, height)
    interp = Interp(dom.globals())
    for script in scripts:
        interp.run(script)
    return interp, dom


def rasterize_draw(draw, pos_loc=0.0, col_loc=1.0):
    """Software-rasterize one recorded TRIANGLES drawArrays() exactly per
    the viewer's vertex shader (q=(p-view.xy)*view.zw; clip=(2q.x-1,
    1-2q.y)) and GL's viewport transform + linear varying interpolation.

    Returns an (h, w, 3) float image initialized to the clear color.
    """
    w, h = (int(draw["canvas_size"][0]), int(draw["canvas_size"][1]))
    pos, psize = draw["attribs"][pos_loc]
    col, csize = draw["attribs"][col_loc]
    assert psize == 2 and csize == 3
    pos = np.asarray(pos, np.float64).reshape(-1, 2)[: draw["count"]]
    col = np.asarray(col, np.float64).reshape(-1, 3)[: draw["count"]]
    view = np.asarray(draw["uniforms"]["view"], np.float64)

    q = (pos - view[:2]) * view[2:4]
    clip = np.stack([q[:, 0] * 2.0 - 1.0, 1.0 - q[:, 1] * 2.0], axis=1)
    # GL window coords (origin bottom-left) -> image rows from the top.
    sx = (clip[:, 0] + 1.0) / 2.0 * w
    sy = h - (clip[:, 1] + 1.0) / 2.0 * h

    img = np.empty((h, w, 3), np.float64)
    img[:] = draw["clear_color"][:3]
    for t in range(draw["count"] // 3):
        p = np.stack([sx[3 * t:3 * t + 3], sy[3 * t:3 * t + 3]], axis=1)
        c = col[3 * t:3 * t + 3]
        x0 = max(int(np.floor(p[:, 0].min())), 0)
        x1 = min(int(np.ceil(p[:, 0].max())) + 1, w)
        y0 = max(int(np.floor(p[:, 1].min())), 0)
        y1 = min(int(np.ceil(p[:, 1].max())) + 1, h)
        if x0 >= x1 or y0 >= y1:
            continue
        gx, gy = np.meshgrid(np.arange(x0, x1) + 0.5,
                             np.arange(y0, y1) + 0.5)
        det = ((p[1, 1] - p[2, 1]) * (p[0, 0] - p[2, 0])
               + (p[2, 0] - p[1, 0]) * (p[0, 1] - p[2, 1]))
        if abs(det) < 1e-12:
            continue
        w0 = ((p[1, 1] - p[2, 1]) * (gx - p[2, 0])
              + (p[2, 0] - p[1, 0]) * (gy - p[2, 1])) / det
        w1 = ((p[2, 1] - p[0, 1]) * (gx - p[2, 0])
              + (p[0, 0] - p[2, 0]) * (gy - p[2, 1])) / det
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        shade = (w0[..., None] * c[0] + w1[..., None] * c[1]
                 + w2[..., None] * c[2])
        sub = img[y0:y1, x0:x1]
        sub[inside] = shade[inside]
    return img


def world_to_offset(view, canvas_w, canvas_h, wx, wy):
    """Invert the probe()/pan math: world point -> mouse offsetX/Y."""
    return ((wx - view[0]) * view[2] * canvas_w,
            (wy - view[1]) * view[3] * canvas_h)
