"""North-star benchmark: the BASELINE.md target workload — a 1M-DoF
4-layer board solved to 1e-8 relative residual on the current device.

The workload is generated (tests/boardgen.gen_bench_4layer): four
full-area copper planes, a 7x7 through-via stitching grid (each via
expands into the loader's hollow-cylinder resistor stack), two voltage
sources and two high-current loads — so the solve carries a real MNA
border (m > 1) and the meshes carry the full via-hole punching, exactly
the shape BASELINE.md names ("1M-DoF 4-layer board").

Pipeline timed per stage:
  load     KiCad project -> problem IR (host)
  mesh     connectivity + CDT meshing + FEM/MNA assembly (host)
  setup    AMG hierarchy + device upload (ops.schur.DiaBorderedSolver)
  solve    bordered Schur solve + f64 iterative refinement to
           1e-8 * ||rhs|| (median of 3 compile-warm runs)

Prints ONE JSON line:
  {"metric": "solve_dof_per_sec", "value": N, "unit": "DoF/s",
   "vs_baseline": N / 1e6}
vs_baseline normalizes against the BASELINE.md target of 1M DoF solved
per second (1M-DoF board in <1 s).
"""

import json
import os
import sys
import time

import numpy as np


_BENCH_T0 = time.time()


def _progress(msg, _t0=[None]):
    if _t0[0] is None:
        _t0[0] = time.time()
    print("[bench %7.1fs] %s" % (time.time() - _t0[0], msg),
          file=sys.stderr, flush=True)


def _tpu_available(timeout_s: int = 150) -> bool:
    """Bounded accelerator probe in a subprocess — initializing the
    axon backend in-process hangs indefinitely (not just errors) when
    the tunnel is down, which would leave the whole bench without any
    result."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "print(d[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return r.returncode == 0 and "cpu" not in r.stdout
    except subprocess.TimeoutExpired:
        return False


SYSTEM_CACHE = None


def _system_cache_path() -> str:
    """Per-run unique probe-input path (the probe subprocesses take it
    as argv[2]).  A fixed /tmp name would let concurrent bench runs
    clobber each other and another user pre-create the file.  Lazy so
    the probe subprocesses (which re-import this module) don't leak an
    empty temp file each."""
    global SYSTEM_CACHE
    if SYSTEM_CACHE is None:
        import tempfile

        fd, path = tempfile.mkstemp(prefix="padne_bench_system_",
                                    suffix=".npz")
        os.close(fd)
        SYSTEM_CACHE = path
    return SYSTEM_CACHE


def _save_system(system, v, path=None):
    """CoreSystem (+ our solution v) as flat arrays, for the scipy and
    warm-start probe subprocesses."""
    path = path or _system_cache_path()
    b = system.border
    np.savez(
        path, n=system.n, cols=system.ell.cols, vals=system.ell.vals,
        diag=system.ell.diag, comp_id=system.comp_id,
        num_components=system.num_components, r_core=system.r_core,
        ground_var=system.ground_var, coords=system.coords,
        group=system.group, m=b.m, row_idx=b.row_idx,
        row_node=b.row_node, row_val=b.row_val, col_idx=b.col_idx,
        col_node=b.col_node, col_val=b.col_val, rhs=b.rhs, v=v,
    )


def _load_system(path):
    from padne_tpu.ops import assembly, schur

    z = np.load(path)
    border = schur.BorderSpec(
        m=int(z["m"]), row_idx=z["row_idx"], row_node=z["row_node"],
        row_val=z["row_val"], col_idx=z["col_idx"],
        col_node=z["col_node"], col_val=z["col_val"], rhs=z["rhs"],
    )
    system = schur.CoreSystem(
        n=int(z["n"]),
        ell=assembly.EllMatrix(cols=z["cols"], vals=z["vals"],
                               diag=z["diag"]),
        comp_id=z["comp_id"], num_components=int(z["num_components"]),
        border=border, r_core=z["r_core"],
        ground_var=int(z["ground_var"]), coords=z["coords"],
        group=z["group"],
    )
    return system, z["v"]


def _scipy_probe(path):
    """Head-to-head vs the reference's solver class: scipy spsolve
    (SuperLU, the reference's hot path, solver.py:767-780) on the SAME
    assembled system.  Prints one JSON line."""
    sys.path.insert(0, "/root/repo")
    from padne_tpu import solver

    system, v_ours = _load_system(path)
    L, r = solver.system_to_scipy(system)
    import scipy.sparse.linalg

    t0 = time.time()
    z = scipy.sparse.linalg.spsolve(L, r)
    t_solve = time.time() - t0
    # Our core solves [A | C; B | 0] with +A; reference layout is -A, so
    # compare potentials over the core block directly.
    max_dv = float(np.max(np.abs(z[:system.n] - v_ours)))
    print(json.dumps({
        "reference_scipy_seconds": round(t_solve, 3),
        "reference_scipy_max_dv": max_dv,
        "dof": system.n,
    }))


def _warm_probe(path):
    """Second-process warm start: persistent compilation cache is hot,
    the system is pre-assembled — measures what a user pays to get the
    first solve out of a fresh process.  Prints one JSON line."""
    sys.path.insert(0, "/root/repo")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if os.environ.get("PADNE_TPU_X64", "1") != "0":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    t0 = time.time()
    wake = jnp.ones((8,), jnp.float32).sum()
    float(wake)
    t_wake = time.time() - t0

    from padne_tpu.ops import schur

    system, _ = _load_system(path)
    bnorm = float(np.sqrt((system.r_core**2).sum()
                          + (system.border.rhs**2).sum()))
    t0 = time.time()
    dia_solver = schur.DiaBorderedSolver(system)
    t_setup = time.time() - t0
    t0 = time.time()
    result = dia_solver.solve(target_residual=1e-8 * bnorm,
                              max_refinements=12)
    t_first = time.time() - t0
    t0 = time.time()
    dia_solver.solve(target_residual=1e-8 * bnorm, max_refinements=12)
    t_second = time.time() - t0
    print(json.dumps({
        "warm_wake_seconds": round(t_wake, 3),
        "warm_setup_seconds": round(t_setup, 3),
        "warm_start_seconds": round(t_first, 3),
        "warm_solve_seconds": round(t_second, 3),
        "warm_rel_residual": result.residual_norm / bnorm,
    }))


def _serve_client_probe(path, socket_path):
    """What a fresh `padne-tpu solve` pays when a resident serve
    daemon (here: the bench process itself, hot) is running: load the
    pre-assembled system, ship it over the socket, get the solution.
    Prints one JSON line."""
    sys.path.insert(0, "/root/repo")
    from padne_tpu import serve

    t0 = time.time()
    system, _ = _load_system(path)
    t_load = time.time() - t0
    bnorm = float(np.sqrt((system.r_core**2).sum()
                          + (system.border.rhs**2).sum()))
    t0 = time.time()
    res = serve.client_solve(system, target_residual=1e-8 * bnorm,
                             max_refinements=12,
                             socket_path=socket_path)
    t_solve = time.time() - t0
    if res is None:
        print(json.dumps({"warm_serve_error": "no server"}))
        return
    print(json.dumps({
        "warm_serve_load_seconds": round(t_load, 3),
        "warm_serve_seconds": round(t_solve, 3),
        "warm_serve_rel_residual": res.residual_norm / bnorm,
    }))


def _run_probe(mode, path, timeout_s, extra_args=()):
    """Run a probe in a subprocess; returns its parsed JSON or None."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, __file__, mode, path, *extra_args],
            capture_output=True, text=True, timeout=timeout_s,
        )
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                return json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
        _progress(f"{mode} probe produced no JSON "
                  f"(rc={r.returncode}): {r.stderr[-300:]}")
    except subprocess.TimeoutExpired:
        _progress(f"{mode} probe timed out after {timeout_s}s")
    return None


def _kernel_accounting(dia_solver) -> dict:
    """Isolated hot-kernel timings + achieved bandwidth (GB/s), so a
    regression in any one kernel is attributable from BENCH detail
    instead of showing up as unexplained solve_seconds drift.

    Bytes counted are the dominant HBM streams each kernel must move
    (weight slabs + the level-0-sized vector traffic); achieved GB/s is
    therefore a lower bound on the kernel's real traffic rate.
    """
    import jax
    import jax.numpy as jnp

    from padne_tpu.ops import comp as comp_mod
    from padne_tpu.ops import dia

    meta = dia_solver._meta0
    np_, b, g, ng, offs = meta
    d = len(offs)
    backend = dia_solver._backend
    R = dia_solver.m + 1
    out = {}

    def timed(fn, *args, reps=5):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.time() - t0) / reps

    xt = jnp.ones((R, np_), jnp.float32)
    op = dia_solver._op_exact
    if op is not None:
        f = jax.jit(lambda prm, xt: dia.dia_matvec_t(
            meta, prm, xt, backend=backend))
        dt = timed(f, op, xt)
        slab_b = ng * g * d * b * b * op["w"].dtype.itemsize
        io_b = slab_b + R * np_ * 4 * 2
        out["l0_slab_matvec_ms"] = round(dt * 1e3, 3)
        out["l0_slab_matvec_gbps"] = round(io_b / dt / 1e9, 1)

    va, vp = getattr(dia_solver, "_vcycle_pair", (None, None))
    if va is not None:
        fv = jax.jit(lambda p, xt: va(p, xt))
        dt = timed(fv, vp, xt)
        # Dominant streams: 4 level-0 slab passes (bf16) + the
        # level-0-sized vector traffic of the smoothing/transfer chain.
        w0 = vp[0]["w"]
        slab_b = ng * g * d * b * b * w0.dtype.itemsize
        io_b = 4 * slab_b + 10 * R * np_ * 4
        out["vcycle_ms"] = round(dt * 1e3, 3)
        out["vcycle_gbps"] = round(io_b / dt / 1e9, 1)

    c = getattr(dia_solver, "_comp", None)
    if c is not None:
        x = jnp.ones(np_, jnp.float32)
        cop = c["op"]
        fc = jax.jit(lambda prm, x: comp_mod.apply(cop, prm, x, meta))
        dt = timed(fc, cop.params, x)
        # hi + lo f32 slabs + the f64 result stream.
        io_b = 2 * ng * g * d * b * b * 4 + np_ * (4 + 8)
        out["comp_matvec_ms"] = round(dt * 1e3, 3)
        out["comp_matvec_gbps"] = round(io_b / dt / 1e9, 1)

    host_vec = np.ones(np_, np.float32)
    t0 = time.time()
    dev = jax.device_put(host_vec)
    jax.block_until_ready(dev)
    dt_up = time.time() - t0
    out["rc_upload_ms"] = round(dt_up * 1e3, 1)
    out["rc_upload_gbps"] = round(np_ * 4 / dt_up / 1e9, 3)
    t0 = time.time()
    _ = np.asarray(dev)
    dt_dn = time.time() - t0
    out["v_download_ms"] = round(dt_dn * 1e3, 1)
    out["v_download_gbps"] = round(np_ * 4 / dt_dn / 1e9, 3)
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--scipy-probe":
        _scipy_probe(sys.argv[2])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--warm-probe":
        _warm_probe(sys.argv[2])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--serve-probe":
        _serve_client_probe(sys.argv[2], sys.argv[3])
        return
    target_dof = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    sys.path.insert(0, "/root/repo")
    from tests.boardgen import gen_bench_4layer

    pro = gen_bench_4layer("/tmp/padne_bench_board")

    import jax

    on_tpu = _tpu_available()
    if not on_tpu:
        # Honest degraded mode: the tunnel is down, so measure the same
        # pipeline on the host CPU at a reduced DoF target (a 1M CPU
        # solve takes tens of minutes) and label the result clearly.
        _progress("TPU tunnel unavailable — CPU fallback at reduced DoF")
        jax.config.update("jax_platforms", "cpu")
        target_dof = min(target_dof, 250_000)

    # Persistent compilation cache: the CG+V-cycle program compiles
    # many Mosaic kernels through the (slow, remote) axon compile
    # helper — minutes cold, seconds warm.
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # x64 on: enables the f64 device anchor (the solver keeps its hot
    # path in explicit f32; this only allows f64 arrays to exist).
    # PADNE_TPU_X64=0 restores the pre-anchor configuration.
    if os.environ.get("PADNE_TPU_X64", "1") != "0":
        jax.config.update("jax_enable_x64", True)

    # Device wake-up, overlapped with the host pipeline below.  The
    # first *blocking* device sync of a process through the axon tunnel
    # intermittently costs 30-360 s (measured on a trivial
    # jnp.ones(8).sum() pull: 196 s; same process, everything after:
    # ms) — an environmental per-process tax, unrelated to program
    # content.  Dispatch a throwaway op now (async, ms), pull it after
    # the host meshing so the tax is paid early, on its own line item,
    # and never inside the AMG-setup stage timing.  NOTE: must stay on
    # the main thread — backend init from a background thread hangs
    # indefinitely on this platform (measured).
    import jax.numpy as _jnp_wake

    wake_t0 = time.time()
    wake_ref = _jnp_wake.ones((8,), _jnp_wake.float32).sum()

    from padne_tpu import kicad, mesh, solver
    from padne_tpu.ops import schur

    t0 = time.time()
    prob = kicad.load_kicad_project(pro)
    t_load = time.time() - t0
    _progress(f"loaded: {len(prob.layers)} layers, "
              f"{len(prob.networks)} networks in {t_load:.1f}s")

    # Mesh density for the DoF target: vertices ~ area / (0.43 size^2).
    area = sum(layer.shape.area for layer in prob.layers)
    size = max(0.05, (area / (0.43 * target_dof)) ** 0.5)
    cfg = mesh.Mesher.Config(
        maximum_size=size, variable_size_maximum_factor=1.0
    )

    t0 = time.time()
    system, meshes, *_ = solver.build_system(prob, mesher_config=cfg)
    t_mesh = time.time() - t0
    n = system.n
    _progress(f"meshed+assembled n={n} (m={system.border.m}, "
              f"{len(meshes)} meshes) in {t_mesh:.1f}s")

    bnorm = float(np.sqrt((system.r_core**2).sum()
                          + (system.border.rhs**2).sum()))
    tol_rel = 1e-8  # BASELINE.md row 1: 1e-8 relative residual
    target_abs = tol_rel * bnorm

    float(wake_ref)  # blocking pull: pays the per-process first-sync tax
    t_wake = time.time() - wake_t0
    _progress(f"device wake sync: {t_wake:.1f}s after dispatch")

    t0 = time.time()
    import jax.numpy as jnp

    if on_tpu:
        dia_solver = schur.DiaBorderedSolver(system)

        def run_solve():
            return dia_solver.solve(target_residual=target_abs,
                                    max_refinements=12)
    else:
        # CPU fallback: the ELL gather path beats the DIA slab off-TPU
        # (no MXU to feed; the inflated slab stream is pure overhead —
        # measured 7 s vs 88 s at 250k DoF).  Setup re-runs per call,
        # which the fallback label makes clear enough.
        def run_solve():
            return schur.solve_bordered(
                system, device_dtype=jnp.float32, operator="ell",
                target_residual=target_abs, max_refinements=12)

    t_setup = time.time() - t0
    _progress(f"AMG setup + upload in {t_setup:.1f}s")

    _progress("warmup (compile)...")
    t0 = time.time()
    result = run_solve()
    _progress(f"warmup done in {time.time()-t0:.1f}s "
              f"(rel={result.residual_norm/bnorm:.2e})")

    times = []
    for run in range(3):
        t0 = time.time()
        result = run_solve()
        times.append(time.time() - t0)
        _progress(f"run {run}: {times[-1]:.2f}s "
                  f"iters={result.cg_iterations} "
                  f"passes={result.refinement_steps + 1} "
                  f"rel={result.residual_norm/bnorm:.2e}")
    t_solve = float(np.median(times))
    dof_per_sec = n / t_solve

    # Head-to-head + warm-start probes (subprocesses, time-boxed).
    # Skipped when the run is already long (e.g. a 10-minute evening
    # first-sync tax) so the core metric always lands within a driver
    # timeout; the probes are additive detail, not the metric.
    probe_detail = {}
    _save_system(system, np.asarray(result.v))
    # Collect hierarchy + kernel detail NOW, then release the in-process
    # solver: the serve probe's daemon (this process) builds a SECOND
    # full 1M solver state on device, and two copies exhaust one chip's
    # HBM (measured RESOURCE_EXHAUSTED).
    hierarchy_detail = {}
    if on_tpu:
        lv0 = dia_solver.hierarchy.levels[0]
        hierarchy_detail = {
            "amg_levels": [lv.pack.np_
                           for lv in dia_solver.hierarchy.levels],
            "level0_offsets": list(lv0.pack.offs),
            "level0_remainder": len(lv0.pack.rem_rows),
        }
        try:
            hierarchy_detail["kernels"] = _kernel_accounting(dia_solver)
        except Exception as e:  # noqa: BLE001 — accounting is additive
            _progress(f"kernel accounting failed: {e!r}")
    probes_on = os.environ.get("PADNE_TPU_BENCH_PROBES", "1") != "0"
    # Elapsed-budget guards: a slow-wake night (measured 234-880 s
    # first-sync taxes) plus the full probe set can push past a
    # driver's timeout, losing the WHOLE record.  Each probe checks
    # the wall clock so the JSON line always lands.
    def _elapsed():
        return time.time() - _BENCH_T0

    if probes_on and on_tpu and t_wake < 600 and _elapsed() < 650:
        # Serve-path warm start FIRST, under a generous wake guard: the
        # client never initializes a device (npz load + socket + the
        # hot daemon = this process), so the probe costs ~20 s even on
        # a slow-wake day.  The product answer to the per-process
        # executable-load floor: the cost of a user's SECOND
        # `padne-tpu solve` while `padne-tpu serve` is running.
        _progress("warm-start probe (client -> resident server)...")
        import tempfile as _tf
        import threading as _th

        from padne_tpu import serve as _serve

        _sock = _tf.mktemp(prefix="padne_bench_serve_", suffix=".sock")
        _ready = _th.Event()
        # The daemon adopts the bench's OWN solver (preload): the warm
        # path a user hits when the daemon has already served this
        # board (the GUI-iteration loop).  A brand-new solver instance
        # would re-trace + re-load every executable — the "new board,
        # hot daemon" cost — which warm_start_seconds below tracks via
        # the fresh-process probe.
        _srv = _th.Thread(
            target=_serve.serve,
            kwargs=dict(socket_path=_sock, max_requests=4,
                        ready_event=_ready,
                        preload=[(system, dia_solver)]),
            daemon=True)
        _srv.start()
        _ready.wait(30)
        sp2 = _run_probe("--serve-probe", _system_cache_path(),
                         int(os.environ.get(
                             "PADNE_TPU_WARM_TIMEOUT", "1500")),
                         extra_args=(_sock,))
        _serve.shutdown(_sock)
        if sp2:
            probe_detail.update(sp2)
            _progress("warm start via server: "
                      f"{sp2.get('warm_serve_seconds')}s "
                      f"(+ {sp2.get('warm_serve_load_seconds')}s load)")
    if on_tpu:
        # Release the solver before the fresh-process probe below — a
        # second full 1M solver state alongside this one exhausts HBM
        # (measured RESOURCE_EXHAUSTED).
        del run_solve, dia_solver
        import gc

        gc.collect()
    if probes_on and t_wake < 240 and _elapsed() < 420:
        _progress("scipy (SuperLU) head-to-head probe...")
        sp = _run_probe("--scipy-probe", _system_cache_path(),
                        int(os.environ.get("PADNE_TPU_SCIPY_TIMEOUT",
                                           "900")))
        if sp:
            probe_detail.update(sp)
            probe_detail.pop("dof", None)
            _progress(
                f"scipy spsolve: {sp['reference_scipy_seconds']}s "
                f"(max |dV| vs ours {sp['reference_scipy_max_dv']:.2e})")
        else:
            probe_detail["reference_scipy_seconds"] = None
        if on_tpu:
            # Legacy local warm start (no daemon running): the fresh
            # process pays executable loading; kept for honesty +
            # regression tracking.  PADNE_TPU_BENCH_LOCAL_WARM=0 skips.
            if (os.environ.get("PADNE_TPU_BENCH_LOCAL_WARM", "1")
                    != "0" and _elapsed() < 550):
                _progress("warm-start probe (second process, no "
                          "server)...")
                wp = _run_probe("--warm-probe", _system_cache_path(),
                                int(os.environ.get(
                                    "PADNE_TPU_WARM_TIMEOUT", "1500")))
                if wp:
                    probe_detail.update(wp)
                    _progress(
                        f"warm start: setup {wp['warm_setup_seconds']}s"
                        f" + first solve {wp['warm_start_seconds']}s")

    out = {
        "metric": "solve_dof_per_sec",
        "value": round(dof_per_sec, 1),
        "unit": "DoF/s",
        "vs_baseline": round(dof_per_sec / 1e6, 4),
        "detail": {
            "workload": "generated 4-layer PDN board (via grid + MNA border)",
            "dof": n,
            "n_layers": len(prob.layers),
            "n_meshes": len(meshes),
            "border_m": system.border.m,
            "solve_seconds": round(t_solve, 3),
            "load_seconds": round(t_load, 3),
            "mesh_seconds": round(t_mesh, 3),
            "amg_setup_seconds": round(t_setup, 3),
            "device_wake_seconds": round(t_wake, 3),
            "end_to_end_seconds": round(
                t_load + t_mesh + t_setup + t_solve, 3),
            "cg_iterations": result.cg_iterations,
            "refinement_passes": result.refinement_steps + 1,
            "final_rel_residual": result.residual_norm / bnorm,
            "rhs_columns": system.border.m + 1,
            **probe_detail,
            **hierarchy_detail,
            "device": str(jax.devices()[0]) + (
                "" if on_tpu
                else " (CPU FALLBACK at reduced DoF — TPU tunnel down)"),
        },
    }
    if not on_tpu:
        # Context for a fallback record: the most recent figure from the
        # real accelerator, so a tunnel outage at measurement time is
        # not mistaken for a solver regression.
        out["detail"]["last_tpu_measurement"] = {
            "date": "2026-08-20",
            "device": "TPU v5 lite (1 chip via axon tunnel)",
            "dof": 1_087_535,
            "solve_seconds": 2.18,
            "dof_per_sec": 498_869,
            "vs_baseline": 0.499,
            "cg_iterations": 30,
            "refinement_passes": 3,
            "final_rel_residual": 1.28e-09,
            "reference_scipy_seconds": 55.97,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
