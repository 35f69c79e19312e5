"""Host-side profile of the DIA solver setup at the bench workload.

Runs on CPU (JAX_PLATFORMS=cpu) so the device upload is ~free and the
timings isolate HOST compute: ELL->CSR, Hilbert ordering, pack_dia,
Galerkin products, coarse eigh.  Usage:

    JAX_PLATFORMS=cpu python benchmarks/profile_setup.py [target_dof]
"""

import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# Force CPU regardless of the sitecustomize-pinned accelerator platform
# (host profiling must not depend on tunnel availability).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    target_dof = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from tests.boardgen import gen_bench_4layer
    from padne_tpu import kicad, mesh, solver
    from padne_tpu.ops import schur

    pro = gen_bench_4layer("/tmp/padne_bench_board")
    prob = kicad.load_kicad_project(pro)
    area = sum(layer.shape.area for layer in prob.layers)
    size = max(0.05, (area / (0.43 * target_dof)) ** 0.5)
    cfg = mesh.Mesher.Config(
        maximum_size=size, variable_size_maximum_factor=1.0
    )
    t0 = time.time()
    system, meshes, *_ = solver.build_system(prob, mesher_config=cfg)
    print(f"mesh+assemble {time.time()-t0:.1f}s n={system.n}",
          flush=True)

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    dia_solver = schur.DiaBorderedSolver(system)
    prof.disable()
    print(f"setup {time.time()-t0:.1f}s", flush=True)
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(40)


if __name__ == "__main__":
    main()
