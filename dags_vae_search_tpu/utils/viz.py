"""DAG visualization (matplotlib).

Parity with the reference's rendering utilities
(``experiments/01_bn_asia/main.py:396-538``): a layered DAG drawing with
arrow patches plus a three-panel generated / PACE-wrapped / decoded demo.
Layout is longest-path layering with barycenter ordering (the classic
Sugiyama phases the reference gets from igraph's ``layout("sugiyama")``),
computed directly from the adjacency tensor — no graph library needed.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def layered_layout(adj: np.ndarray) -> np.ndarray:
    """[N, 2] positions: y = longest-path layer, x = barycenter order."""
    adj = np.asarray(adj) > 0
    n = adj.shape[0]
    layer = np.zeros(n, dtype=int)
    for j in range(n):  # topological index order: parents precede children
        parents = np.flatnonzero(adj[:, j])
        if parents.size:
            layer[j] = layer[parents].max() + 1

    x = np.zeros(n)
    for lvl in sorted(set(layer.tolist())):
        nodes = np.flatnonzero(layer == lvl)
        bary = []
        for v in nodes:
            parents = np.flatnonzero(adj[:, v])
            bary.append(x[parents].mean() if parents.size else float(v))
        order = nodes[np.argsort(bary, kind="stable")]
        for rank, v in enumerate(order):
            count = len(nodes)
            x[v] = (rank + 0.5) / count

    max_layer = max(layer.max(), 1)
    y = 1.0 - layer / max_layer
    return np.stack([x, y], axis=1)


def draw_dag(
    adj: np.ndarray,
    ax,
    labels: Optional[Sequence] = None,
    node_size: float = 0.035,
    node_color: str = "skyblue",
    edge_color: str = "k",
    arrowsize: float = 15,
    fontsize: int = 8,
) -> None:
    """Draw one DAG (adjacency tensor) on a matplotlib Axes."""
    from matplotlib.patches import FancyArrowPatch
    import matplotlib.pyplot as plt

    adj = np.asarray(adj)
    n = adj.shape[0]
    pos = layered_layout(adj)

    for a, b in zip(*np.nonzero(adj > 0)):
        ax.add_patch(
            FancyArrowPatch(
                tuple(pos[a]),
                tuple(pos[b]),
                arrowstyle="-|>",
                mutation_scale=arrowsize,
                color=edge_color,
                linewidth=1,
                zorder=1,
                shrinkA=8,
                shrinkB=8,
            )
        )
    for v in range(n):
        ax.add_patch(
            plt.Circle(
                tuple(pos[v]), radius=node_size, facecolor=node_color,
                edgecolor="k", zorder=2,
            )
        )
        text = str(labels[v]) if labels is not None else str(v)
        ax.text(
            pos[v, 0], pos[v, 1], text, fontsize=fontsize,
            ha="center", va="center", zorder=3,
        )
    ax.set_xlim(-0.08, 1.08)
    ax.set_ylim(-0.08, 1.08)
    ax.set_aspect("equal")
    ax.axis("off")


def draw_examples(
    model,
    variables,
    labels: np.ndarray,
    adj: np.ndarray,
    out_path: Optional[str] = None,
    naming: Optional[dict] = None,
):
    """Three-panel demo: original / PACE-wrapped / decoded reconstruction
    (parity with ``draw_examples``, ``main.py:482-538``)."""
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dags_vae_search_tpu.graphs.dag import pace_wrap
    from dags_vae_search_tpu.models.decode import decode_to_labeled
    from dags_vae_search_tpu.models.pace_vae import PaceVAE

    name = naming or {}

    def names(ls: np.ndarray) -> List[str]:
        return [str(name.get(int(v), int(v))) for v in ls]

    lb = jnp.asarray(labels)[None] if labels.ndim == 1 else jnp.asarray(labels[:1])
    ad = jnp.asarray(adj)[None] if adj.ndim == 2 else jnp.asarray(adj[:1])

    wrapped = pace_wrap(lb, ad)
    mu, _ = model.apply(variables, lb, ad, method=PaceVAE.encode)
    recon, valid = decode_to_labeled(model, variables, mu, jax.random.PRNGKey(0))

    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(18, 5))
    fig.suptitle("DAG-VAE round trip")
    ax1.set_title("Original DAG")
    draw_dag(np.asarray(ad[0]), ax1, names(np.asarray(lb[0])))
    ax2.set_title("PACE wrapping")
    pace_names = ["Start", "Input"] + names(
        np.asarray(wrapped.labels[0])[2:-1] - 3
    ) + ["Output"]
    draw_dag(np.asarray(wrapped.adj[0]), ax2, pace_names)
    ax3.set_title(f"Decoded DAG (valid={bool(valid[0])})")
    draw_dag(np.asarray(recon.adj[0]), ax3, names(np.asarray(recon.labels[0])))
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig
