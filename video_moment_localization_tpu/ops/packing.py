"""Triangular-packed proposal-map layout.

The reference computes every (L, L) moment-map op densely and multiplies by
the upper-triangular validity mask (reference models.py:117,247,263,269,
300-302,337) — at L=64 that spends ~47% of the SMI stack's FLOPs and HBM on
moments that are zeroed anyway. TPU-natively we instead *pack* the map to
its N = L(L+1)/2 valid (start i <= end j) pairs and run the whole
interaction stack in (B, N, ...) layout:

* pack/unpack are static-index gathers/scatters (XLA lowers them well);
* per-start-row reductions (boundary unit's moment message) become one
  matmul against a static one-hot row-aggregation matrix (MXU, no scatter);
* the dense (B, L, L) map only reappears at the scoring head, where the
  eval contract needs it.

Numerics are identical to the dense path at valid positions (same ops, same
order); invalid positions are 0 by construction instead of by masking.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TriuPacking:
    """Static packing metadata for an L x L upper-triangular map."""

    L: int
    N: int                   # number of valid pairs = L(L+1)/2
    i_idx: np.ndarray        # (N,) start-snippet index per pair
    j_idx: np.ndarray        # (N,) end-snippet index per pair
    flat_idx: np.ndarray     # (N,) i * L + j (into a flattened dense map)
    row_onehot: np.ndarray   # (L, N) float32: row_onehot[i, n] = [i_idx[n] == i]


@lru_cache(maxsize=None)
def triu_packing(L: int) -> TriuPacking:
    i_idx, j_idx = np.triu_indices(L)
    i_idx = i_idx.astype(np.int32)
    j_idx = j_idx.astype(np.int32)
    N = i_idx.shape[0]
    row_onehot = np.zeros((L, N), np.float32)
    row_onehot[i_idx, np.arange(N)] = 1.0
    return TriuPacking(L=L, N=N, i_idx=i_idx, j_idx=j_idx,
                       flat_idx=(i_idx * L + j_idx).astype(np.int32),
                       row_onehot=row_onehot)


def pack_map(x: jnp.ndarray, L: int) -> jnp.ndarray:
    """(B, L, L, ...) -> (B, N, ...) keeping valid pairs only."""
    p = triu_packing(L)
    B = x.shape[0]
    flat = x.reshape((B, L * L) + x.shape[3:])
    return jnp.take(flat, jnp.asarray(p.flat_idx), axis=1)


def unpack_map(x: jnp.ndarray, L: int) -> jnp.ndarray:
    """(B, N, ...) -> dense (B, L, L, ...) with zeros at invalid pairs."""
    p = triu_packing(L)
    B = x.shape[0]
    dense = jnp.zeros((B, L * L) + x.shape[2:], x.dtype)
    dense = dense.at[:, jnp.asarray(p.flat_idx)].set(x)
    return dense.reshape((B, L, L) + x.shape[2:])


def packed_valid_mask(length_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, L) length mask -> (B, N) packed validity (triu is implicit)."""
    L = length_mask.shape[1]
    p = triu_packing(L)
    return (jnp.take(length_mask, jnp.asarray(p.i_idx), axis=1)
            * jnp.take(length_mask, jnp.asarray(p.j_idx), axis=1))


def gather_rows(x: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """(B, L, D) -> (B, N, D) gathered at static per-pair indices.

    Lowered as a one-hot matmul rather than jnp.take: the gather's VJP is a
    scatter-add (serialized on TPU), while the matmul transposes into
    another matmul — and the forward rides the MXU too (measured faster at
    serving batch in the moment unit).
    """
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    onehot = _gather_onehot(x.shape[1], idx.tobytes(), len(idx))
    return jnp.einsum("nl,bld->bnd", jnp.asarray(onehot).astype(x.dtype), x)


@lru_cache(maxsize=None)
def _gather_onehot(L: int, idx_bytes: bytes, n: int) -> np.ndarray:
    idx = np.frombuffer(idx_bytes, dtype=np.int32, count=n)
    onehot = np.zeros((n, L), np.float32)
    onehot[np.arange(n), idx] = 1.0
    return onehot


def gather_cols(x: jnp.ndarray, idx: np.ndarray, F: int) -> jnp.ndarray:
    """(B, F) -> (B, N) static column gather as a one-hot matmul (same
    scatter-free-VJP rationale as gather_rows)."""
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    onehot = _gather_onehot(F, idx.tobytes(), len(idx))
    return jnp.einsum("nf,bf->bn", jnp.asarray(onehot).astype(x.dtype), x)


def rowsum_packed(x: jnp.ndarray, L: int) -> jnp.ndarray:
    """Sum packed pair values over each start row: (B, N, D) -> (B, L, D).

    One matmul against the static one-hot aggregation matrix (MXU-friendly;
    replaces a scatter-add).
    """
    p = triu_packing(L)
    return jnp.einsum("ln,bnd->bld", jnp.asarray(p.row_onehot).astype(x.dtype), x)
