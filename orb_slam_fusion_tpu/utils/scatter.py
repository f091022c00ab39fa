"""Safe masked scatter for padded/batched index updates.

Every SoA-map update in this codebase scatters a padded batch of rows into a
table where only `mask` entries are real. The naive pattern

    table.at[clip(idx)].set(where(mask, vals, table[clip(idx)]))

is WRONG: all the masked-out rows clip to the same slot and race with the
real writer for it (XLA scatter order with duplicate indices is undefined).
The correct pattern routes masked-out rows to an out-of-bounds index and
drops them in the scatter itself.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_set(table: jnp.ndarray, idx: jnp.ndarray, vals,
               mask: jnp.ndarray) -> jnp.ndarray:
    """table[idx[i]] = vals[i] for every i with mask[i]; others dropped.

    idx: (B,) int; vals: (B, ...) broadcastable to table rows; mask: (B,).
    Duplicate *valid* indices still race — callers must ensure real writers
    are unique (they are for compacted appends and per-feature writes).
    """
    n = table.shape[0]
    safe_idx = jnp.where(mask, idx, n)  # out of bounds -> dropped
    return table.at[safe_idx].set(vals, mode="drop")


def masked_set2(table: jnp.ndarray, row: jnp.ndarray, col: jnp.ndarray,
                vals, mask: jnp.ndarray) -> jnp.ndarray:
    """table[row[i], col[i]] = vals[i] where mask[i]; 2-D variant."""
    n = table.shape[0]
    safe_row = jnp.where(mask, row, n)
    return table.at[safe_row, col].set(vals, mode="drop")
