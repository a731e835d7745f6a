"""Multi-chip sharding: frame data-parallelism x CTU-row spatial parallelism.

The reference is single-threaded (SURVEY.md §2.5); HEVC's own parallel
constructs (frame-level, WPP rows, tiles) map to a TPU mesh as:

  axis "frame" : independent frames -> pure data parallelism (all-intra /
                 lenslet coding is embarrassingly frame-parallel)
  axis "row"   : horizontal CTU-row bands within a frame; neighbor bands
                 exchange a 1-row halo (intra top references) via ppermute
                 over ICI

This module provides the dense intra mode-analysis step (the encoder's
batched mode pre-decision: all 35 predictions from original-pixel
references + SATD cost per block) in single-device and mesh-sharded forms.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hevc_hop_tpu.ops import intra


def make_mesh(n_devices: int | None = None, row_par: int | None = None
              ) -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devs)
    if row_par is None:
        row_par = 2 if n % 2 == 0 and n >= 4 else 1
    return Mesh(np.array(devs).reshape(n // row_par, row_par),
                ("frame", "row"))


def _block_chains(tile: jnp.ndarray, halo_top: jnp.ndarray, n: int,
                  bit_depth: int):
    """Chains for every nxn block of a [H, W] tile.

    halo_top: [W] the pixel row directly above the tile (from the neighbor
    band), or mid-gray where absent. Returns (chains [B, 4n+1], avail).
    Availability here is the dense-analysis approximation: left/top
    available inside the frame, bottom-left/top-right clipped at tile edge.
    """
    h, w = tile.shape
    by, bx = h // n, w // n
    ext = jnp.full((h + 1, w + 1), 1 << (bit_depth - 1), tile.dtype)
    ext = ext.at[1:, 1:].set(tile)
    ext = ext.at[0, 1:].set(halo_top)
    # block top-left corner in ext coords
    ys = (jnp.arange(by) * n)[:, None].repeat(bx, 1).reshape(-1) + 1
    xs = (jnp.arange(bx) * n)[None, :].repeat(by, 0).reshape(-1) + 1
    i = jnp.arange(2 * n)
    # chain coords (see models/wavefront.chain_coords)
    cyl = jnp.minimum(ys[:, None] + 2 * n - 1 - i[None], h)   # left, clipped
    cxl = (xs - 1)[:, None].repeat(2 * n, 1)
    cyc = (ys - 1)[:, None]
    cxc = (xs - 1)[:, None]
    cyt = (ys - 1)[:, None].repeat(2 * n, 1)
    cxt = jnp.minimum(xs[:, None] + i[None], w)               # top, clipped
    cy = jnp.concatenate([cyl, cyc, cyt], 1)
    cx = jnp.concatenate([cxl, cxc, cxt], 1)
    chains = ext[cy, cx]
    return chains, ys - 1, xs - 1


def analysis_costs(frame: jnp.ndarray, n: int = 16, bit_depth: int = 8,
                   halo_top: jnp.ndarray | None = None) -> jnp.ndarray:
    """SATD cost of each intra mode for every nxn block. [by, bx, 35]."""
    h, w = frame.shape
    if halo_top is None:
        halo_top = jnp.full((w,), 1 << (bit_depth - 1), frame.dtype)
    chains, ys, xs = _block_chains(frame, halo_top, n, bit_depth)
    preds = intra.predict_all_modes(chains, n, 0, bit_depth, False)
    by, bx = h // n, w // n
    blocks = frame.reshape(by, n, bx, n).transpose(0, 2, 1, 3).reshape(
        -1, n, n)
    costs = intra.satd(blocks[:, None], preds)
    return costs.reshape(by, bx, 35)


def analysis_step_sharded(frames: jnp.ndarray, mesh: Mesh, n: int = 16,
                          bit_depth: int = 8):
    """Mesh-sharded mode analysis over [F, H, W] frames.

    Frames sharded over "frame", rows over "row"; each row band receives
    its top halo row from the band above via ppermute (ICI), then runs the
    dense analysis locally. Returns per-block min-cost [F, by, bx] and
    best mode [F, by, bx].
    """
    try:
        from jax import shard_map
    except ImportError:                      # older jax
        from jax.experimental.shard_map import shard_map

    def local(frames_l):
        # frames_l: [F_l, H_l, W]
        row_idx = jax.lax.axis_index("row")
        nrows = jax.lax.axis_size("row")
        bottom = frames_l[:, -1, :]
        halo = jax.lax.ppermute(
            bottom, "row", [(i, (i + 1) % nrows) for i in range(nrows)])
        halo = jnp.where(row_idx == 0,
                         jnp.full_like(halo, 1 << (bit_depth - 1)), halo)

        def per_frame(fr, ht):
            c = analysis_costs(fr, n, bit_depth, ht)
            return jnp.min(c, -1), jnp.argmin(c, -1).astype(jnp.int32)

        return jax.vmap(per_frame)(frames_l, halo)

    fn = shard_map(local, mesh=mesh,
                   in_specs=P("frame", "row", None),
                   out_specs=(P("frame", "row", None),
                              P("frame", "row", None)))
    sharding = NamedSharding(mesh, P("frame", "row", None))
    frames = jax.device_put(frames, sharding)
    return jax.jit(fn)(frames)
