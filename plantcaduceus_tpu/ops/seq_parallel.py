"""Sequence-parallel (context-parallel) selective scan.

Shards the time axis over a mesh axis — the SSM long-context strategy the
reference never needed (SURVEY.md §5.7 records it as a design option): a
linear recurrence splits across chips with only an ``[rows, D, N]`` state
exchange per shard boundary, unlike attention's all-to-all.

Two-pass scan-correct structure per direction group, inside ``shard_map``:

  pass 1: each device scans its local chunk from zero, emitting its final
          state F and the product of all decay factors P over the chunk
          (one extra multiply per state in the kernel).
  stitch: all_gather the tiny (P, F) pairs over the seq axis and run the
          exclusive first-order recurrence across devices in shard order
          (reversed for reverse-direction groups):
          h0_i = P_{i-1} h0_{i-1} + F_{i-1}.
  pass 2: each device re-scans its chunk seeded with its h0.

Cost: 2x the scan compute + two tiny collectives — the standard trade for
sequence lengths that exceed one chip. Forward-only for now (gradients
would need the same stitching in the adjoint direction; see docs/ROADMAP).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from plantcaduceus_tpu.ops.pallas_scan import (DEF_BD, DEF_BL,
                                               _pallas_scan_group)


def _stitch_h0(aprod, hfin, axis_name: str, n_shards: int, reverse: bool):
    """Exclusive cross-shard state: h0 for THIS device. aprod/hfin are the
    local [R, D, N] pass-1 results."""
    pf = jax.lax.all_gather(
        jnp.stack([aprod, hfin]), axis_name)          # [n, 2, R, D, N]
    idx = jax.lax.axis_index(axis_name)
    order = range(n_shards - 1, -1, -1) if reverse else range(n_shards)
    h0_mine = jnp.zeros_like(hfin)
    carry = jnp.zeros_like(hfin)
    for k in order:
        h0_mine = jnp.where(idx == k, carry, h0_mine)
        carry = pf[k, 0] * carry + pf[k, 1]
    return h0_mine


def selective_scan_seq_sharded(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    Bm: jax.Array,
    Cm: jax.Array,
    Dskip: jax.Array,
    dt_bias: jax.Array,
    dt_proj_w: Optional[jax.Array],
    seq_axis: str,
    n_shards: int,
    directions: Optional[Sequence[bool]] = None,
    bl: int = DEF_BL,
    bd: int = DEF_BD,
) -> jax.Array:
    """Run inside shard_map with the L axis of x/dt/Bm/Cm sharded over
    ``seq_axis`` (arguments hold the LOCAL chunk). Same group semantics as
    selective_scan_pallas. Returns the local y chunk."""
    G = x.shape[0]
    ys = []
    for g in range(G):
        rev = bool(directions[g]) if directions is not None else False
        sel = lambda t: (t[g : g + 1] if t is not None else None)
        args = (sel(x), sel(dt), sel(A), sel(Bm), sel(Cm), sel(Dskip),
                sel(dt_bias), sel(dt_proj_w))
        # pass 1: local scan from zero; collect (decay product, final state)
        _, _, (hfin, aprod) = _pallas_scan_group(
            *args, bl, bd, 1, 1, reverse=rev, emit_hb=False, emit_final=True)
        h0 = _stitch_h0(aprod, hfin, seq_axis, n_shards, rev)
        # pass 2: re-scan seeded with the stitched state
        y_g, _ = _pallas_scan_group(
            *args, bl, bd, 1, 1, reverse=rev, emit_hb=False, h0=h0)
        ys.append(y_g)
    return jnp.concatenate(ys, axis=0)
