"""Field post-processing: per-face gradients and power density.

Replaces the reference's per-face Python loops (solver.py:689-745) with
single vectorized expressions over (F, 3, 2) coordinate batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def face_gradients(vertices: jnp.ndarray, triangles: jnp.ndarray,
                   values: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the P1 (linear) interpolant on each face.

    vertices: (V, 2); triangles: (F, 3); values: (V,).  Returns (F, 2).

    For a triangle with CCW-signed area A and vertices a, b, c:
        grad f = (1 / 2A) * sum_k f_k * rot90(opposite_edge_k)
    with rot90(v) = (-v_y, v_x) and opposite_edge_k oriented CCW.
    """
    p = vertices[triangles]          # (F, 3, 2)
    f = values[triangles]            # (F, 3)
    # Opposite edge of corner k is (p[k+1] -> p[k+2]).
    e = jnp.stack([p[:, 2] - p[:, 1], p[:, 0] - p[:, 2], p[:, 1] - p[:, 0]],
                  axis=1)            # (F, 3, 2)
    rot = jnp.stack([-e[..., 1], e[..., 0]], axis=-1)  # (F, 3, 2)
    area2 = (
        (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
        - (p[:, 1, 1] - p[:, 0, 1]) * (p[:, 2, 0] - p[:, 0, 0])
    )                                # signed 2*area
    grad = jnp.einsum("fk,fkd->fd", f, rot) / area2[:, None]
    return grad


@jax.jit
def power_density(vertices: jnp.ndarray, triangles: jnp.ndarray,
                  values: jnp.ndarray, conductance: float) -> jnp.ndarray:
    """p = sigma * |grad V|^2 per face (reference compute_power_density,
    solver.py:728-745, with sigma = layer sheet conductance)."""
    g = face_gradients(vertices, triangles, values)
    return conductance * (g * g).sum(axis=1)
