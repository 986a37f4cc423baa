"""WSI inference: OpenSlide (or pseudo-slide) -> per-nucleus JSON.

Capability parity with infer/wsi.py in the reference, re-architected:

reference                                this framework
---------                                --------------
cache_chunk.npy + torch DataLoader    -> one host->HBM push of the chunk
workers slicing patches                  image; masked patch subsets are
                                         gathered + batched on device
Pool(1) process serializing mmap      -> a single writer thread draining
writes                                   a queue into the pred_map mmap
ProcessPoolExecutor running cv2/      -> batched on-device post-proc per
scipy watershed per 2048^2 tile          canonical window; async dispatch
                                         with lagged host finalization
"Silent Crash" future polling         -> sequential host callbacks (the
                                         ID-offset bookkeeping is order-
                                         dependent anyway) + per-WSI
                                         try/except

The 3-phase boundary-consistent post-processing (full tiles ->
boundary strips -> 4-corner crosses, infer/wsi.py:556-696) is preserved
exactly: phase 2/3 keep old boundary-straddling nuclei and swap interior
ones for re-predictions.

Deviation (documented): post-proc windows are read at canonical padded
sizes (one compile per window class) with real neighbouring content and
a validity mask. Min-max normalisation statistics are restricted to the
valid box (filters.minmax_norm where=, round 5) — exactly the
reference's per-crop normalisation — while the Sobel window sees true
tissue instead of a reflected border (a strict improvement the 3-phase
stitching tests pin).
"""

from __future__ import annotations

import functools
import glob
import logging
import os
import pathlib
import queue
import shutil
import threading
import time
from typing import Dict

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.tiling import (
    select_patches_in_chunk,
    wsi_chunk_patch_grids,
    wsi_tile_grids,
)
from ..parallel.mesh import (batch_sharding, make_mesh, replicated,
                             shard_map_compat)
from ..ops import cc_np
from ..ops.post_proc_device import compact_labels_u16 as _compact_u16
from ..ops.post_proc_device import proc_np_hv_batch
from ..ops.post_proc_host import extract_instance_info
from ..metrics import remap_label
from . import base
from .steps import extract_patches, infer_output
from .wsi_handler import get_file_handler

logger = logging.getLogger("hover_net_tpu")


# landing-zone rows above/below each device's core stripe of the
# mesh-striped HBM-resident pred buffer: must be >= patch_output_shape
# so a straddling patch output fits whole in both neighbours' stripes
_STRIPE_HALO = 256


def _warn_u16_overflow(n_labels_dev):
    """Loud signal if the uint16 window compaction ever clipped: all
    instances ranked >= 65535 would have been aliased into one label
    (a degenerate prediction far outside the <42k nuclei a 2048^2
    window holds in practice)."""
    n = int(np.max(np.asarray(n_labels_dev)))
    if n > 65535:
        logger.warning(
            "uint16 window compaction overflow: %d instances in one "
            "post-proc window (> 65535) — ids were aliased; rerun with "
            "a smaller tile_shape or inspect the prediction", n,
        )


def _simple_tissue_mask(handler):
    """Otsu at 1.25x + morphology (infer/wsi.py:489-499), skimage-free."""
    thumb = handler.get_full_img(read_mag=1.25)
    gray = cv2.cvtColor(thumb, cv2.COLOR_RGB2GRAY)
    _, mask = cv2.threshold(gray, 0, 255, cv2.THRESH_OTSU)
    mask = cc_np.remove_small_objects(mask == 0, min_size=16 * 16, connectivity=2)
    mask = cc_np.remove_small_holes(mask, area_threshold=128 * 128)
    return cc_np.binary_dilation_disk(mask, 16)


class WSIInferManager(base.InferManagerBase):
    # class-level defaults so partially-constructed instances (tests
    # drive single methods via __new__) fall back to single-device
    # and the mmap pred-map path
    mesh = None
    n_devices = 1
    _pp_fn = None
    _mask_integral = None
    _pred_dev_mode = False
    _pred_dev = None
    # seam-guard escalation: after this many per-window exact re-solves
    # in one slide (a degenerate prediction tripping the guard
    # everywhere — giant merged blobs), stop paying blocked+exact twice
    # per window and flip the rest of the slide's post-proc to the
    # exact scan path directly (bounds the worst case at the exact
    # path's ~2x instead of an unbounded serial re-solve tail)
    _SEAM_REFINE_CAP = 16
    _seam_refines = 0
    _force_exact = False

    def __init__(self, *args, chunk_shape=10000, tile_shape=2048,
                 ambiguous_size=128, proc_mag=40, cache_path="cache",
                 n_devices: int = 1, pred_map_dtype="float16",
                 hbm_pred_budget: int = 4 << 30,
                 force_mesh: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.chunk_shape = int(chunk_shape)
        self.tile_shape = int(tile_shape)
        self.ambiguous_size = int(ambiguous_size)
        self.proc_mag = proc_mag
        self.cache_path = cache_path
        # float16 (default) halves the pred_map mmap (48 vs 96 GB on a
        # 100k x 80k slide), the device->host pull and the disk traffic;
        # probabilities and [-1,1] HV maps lose nothing that survives
        # the 0.5/0.4 thresholds and Sobel-21 (stitching-parity tested).
        # The reference mmaps float32 (infer/wsi.py:529) — pass
        # pred_map_dtype="float32" to match it exactly.
        self.pred_map_dtype = np.dtype(pred_map_dtype)
        # when the whole stitched prediction map fits this HBM budget
        # (single-device runs), it stays RESIDENT ON DEVICE: chunk
        # outputs scatter into it in HBM and post-proc windows slice it
        # on device — no inference-phase D2H pull and no post-proc H2D
        # push at all (the mmap round trip only remains for maps larger
        # than HBM, e.g. the 48 GB 100k x 80k north-star slide)
        self.hbm_pred_budget = int(hbm_pred_budget)
        self._pred_dev = None
        self._pred_dev_mode = False
        self._stripe = None
        self._fwd_fns = {}
        self._pp_shapes = {}
        # multi-chip: a 1-D mesh shards patch/window batches on the
        # leading axis (zero collectives — the TPU-native analog of the
        # reference scaling its batch by GPU count, infer/base.py:69-70).
        # n_devices == 1 keeps the exact single-chip programs.
        n = max(1, min(int(n_devices), len(jax.devices())))
        # force_mesh builds the mesh (and thus the striped-buffer /
        # collective code paths) even at n == 1 — for pricing the
        # striping machinery's overhead against the plain single-chip
        # programs on one real chip (scripts/bench_wsi.py
        # --force_striped)
        self.mesh = make_mesh(n) if (n > 1 or force_mesh) else None
        self.n_devices = n
        self._pp_fn = None
        self._mask_integral = None

    # ------------------------------------------------------- device fns

    def _forward_batch_fn(self):
        """Fused gather+forward for a fixed-size coord batch.

        With a mesh, the coord batch (and thus the gathered patch stack)
        is sharded over devices while the chunk image and weights are
        replicated — each chip gathers and forwards its own patch slice,
        no collectives."""
        if "fwd" not in self._fwd_fns:
            model = self.model
            win = self.cfg.patch_input_shape

            out_dtype = jnp.float16 if self.pred_map_dtype == np.float16 \
                else jnp.float32

            # GSPMD cannot partition Pallas custom calls: the sharded
            # (mesh) forward keeps the standard XLA encoder; the
            # single-device path uses the fused-block Pallas encoder
            allow_fused = self.mesh is None

            def run(variables, chunk_img, coords):
                patches = extract_patches(chunk_img, coords, win)
                # cast on device: halves the D2H transfer for f16 maps
                return infer_output(model, variables, patches,
                                    allow_fused_enc=allow_fused).astype(
                    out_dtype)

            if self.mesh is None:
                self._fwd_fns["fwd"] = jax.jit(run)
            else:
                rep = replicated(self.mesh)
                bsh = batch_sharding(self.mesh)
                self._fwd_fns["fwd"] = jax.jit(
                    run, in_shardings=(rep, rep, bsh), out_shardings=bsh
                )
        return self._fwd_fns["fwd"]

    # --------------------------------------------------------- pipeline

    def _run_chunk(self, chunk_img: np.ndarray, patch_coords: np.ndarray,
                   out_coords: np.ndarray | None = None):
        """Dispatch forwards for all selected patches of one chunk.

        patch_coords: [K, 2] input top-lefts relative to the chunk.
        Default: returns a list of (device_output, valid_count) — device
        handles only; the writer thread pulls them, overlapping the
        transfer with the next chunk's dispatches. HBM-resident mode
        (out_coords given): outputs scatter into the device pred buffer
        instead — nothing crosses to the host.
        """
        fwd = self._forward_batch_fn()
        bs = self.batch_size * self.n_devices
        dev_img = self._push_chunk(chunk_img)
        scatter = self._scatter_fn() if out_coords is not None else None
        dustbin = (np.array(self._pred_dev.shape[:2], np.int32)
                   if out_coords is not None else None)
        outs = []
        for i in range(0, len(patch_coords), bs):
            sub = patch_coords[i : i + bs]
            n = len(sub)
            if n < bs:
                sub = np.concatenate(
                    [sub, np.zeros((bs - n, 2), sub.dtype)], axis=0
                )
            out = fwd(self._mesh_variables(), dev_img,
                      jnp.asarray(sub, jnp.int32))
            if scatter is not None:
                oc = out_coords[i : i + bs].astype(np.int32)
                if n < bs:  # padded entries land in the dustbin slack
                    pad = np.broadcast_to(dustbin, (bs - n, 2))
                    oc = np.concatenate([oc, pad], axis=0)
                self._pred_dev = scatter(self._pred_dev, out,
                                         jnp.asarray(oc))
                continue
            try:  # queue D2H now; the writer thread's pull finds it done
                out.copy_to_host_async()
            except AttributeError:
                pass
            outs.append((out, n))
        return outs

    def _push_chunk(self, chunk_img):
        """Host->device push of one chunk image (replicated over the
        mesh when present). No-op on arrays already on device — callers
        on the prefetch thread push ahead of time so the dispatch loop
        never blocks on an H2D transfer (double-buffered pushes)."""
        if isinstance(chunk_img, jax.Array):
            return chunk_img
        if self.mesh is None:
            return jnp.asarray(chunk_img)
        return jax.device_put(chunk_img, replicated(self.mesh))

    def _mesh_variables(self):
        """Weights replicated over the mesh once (cached)."""
        if self.mesh is None:
            return self.variables
        if "vars" not in self._fwd_fns:
            self._fwd_fns["vars"] = jax.device_put(
                self.variables, replicated(self.mesh)
            )
        return self._fwd_fns["vars"]

    def _post_proc_fn(self, exact: bool = False):
        """proc_np_hv_batch, window batch sharded over the mesh.

        shard_map (not bare jit-with-shardings): on TPU the post-proc
        tail is a Pallas custom call, which GSPMD cannot partition — each
        device must run the whole kernel on its own batch shard.

        exact=True is the seam-guard fallback program (all-XLA scan
        path, compiled lazily — only contract-violating windows pay)."""
        if self._pp_fn is None:
            self._pp_fn = {}
        if exact not in self._pp_fn:
            fn = (lambda p, v:  # noqa: E731
                  _compact_u16(proc_np_hv_batch(p, v, exact=exact)))
            if self.mesh is None:
                self._pp_fn[exact] = jax.jit(fn)
            else:
                from jax.sharding import PartitionSpec as P

                bsh = batch_sharding(self.mesh)
                inner = shard_map_compat(
                    fn, self.mesh, (P("data"), P("data")),
                    (P("data"), P("data")),
                )
                self._pp_fn[exact] = jax.jit(
                    inner, in_shardings=(bsh, bsh),
                    out_shardings=(bsh, bsh),
                )
        return self._pp_fn[exact]

    def _scatter_fn(self):
        """Jitted scatter of a patch-output batch into the HBM-resident
        pred buffer (donated: updated in place). Padded batch entries
        carry the dustbin coordinate (buffer rows beyond the slide,
        never read by post-proc); dynamic_update_slice clamps them
        there."""
        if "scatter" not in self._fwd_fns:
            if self.mesh is None:

                @functools.partial(jax.jit, donate_argnums=0)
                def scatter(buf, outs, coords):
                    def body(i, b):
                        return jax.lax.dynamic_update_slice(
                            b, outs[i].astype(b.dtype),
                            (coords[i, 0], coords[i, 1], 0),
                        )
                    return jax.lax.fori_loop(0, outs.shape[0], body, buf)

            else:
                # striped buffer: all_gather the (batch-sharded) patch
                # outputs over ICI (a few 10s of MB/chunk-batch), then
                # every chip applies the patches that touch ITS core
                # rows — a straddling patch lands whole in both
                # neighbours thanks to the halo rows; misses (and the
                # padded-batch dustbin coordinate) park in the top halo,
                # which no read path ever consumes
                from jax.sharding import PartitionSpec as P

                s_rows, h_halo = self._stripe

                def scatter_local(buf, outs, coords):
                    outs = jax.lax.all_gather(
                        outs, "data", axis=0, tiled=True)
                    row0 = jax.lax.axis_index("data") * s_rows
                    ph, pw = outs.shape[1], outs.shape[2]

                    def body(i, b):
                        oy, ox = coords[i, 0], coords[i, 1]
                        hit = ((oy < row0 + s_rows) & (oy + ph > row0)
                               & (ox + pw <= b.shape[1]))
                        ly = jnp.where(hit, oy - row0 + h_halo, 0)
                        lx = jnp.where(hit, ox, 0)
                        return jax.lax.dynamic_update_slice(
                            b, outs[i].astype(b.dtype), (ly, lx, 0))

                    return jax.lax.fori_loop(0, outs.shape[0], body, buf)

                inner = shard_map_compat(
                    scatter_local, self.mesh,
                    (P("data"), P("data"), P()), P("data"),
                )
                rsh = batch_sharding(self.mesh)
                scatter = jax.jit(
                    inner, donate_argnums=0,
                    in_shardings=(rsh, rsh, replicated(self.mesh)),
                    out_shardings=rsh,
                )
            self._fwd_fns["scatter"] = scatter
        return self._fwd_fns["scatter"]

    def _pp_windows_fn(self, shape, batch=None, exact: bool = False):
        """Per-window-class jitted post-proc over DEVICE slices of the
        resident pred buffer: vmapped dynamic_slice -> validity mask
        from box scalars -> proc_np_hv_batch. Returns (inst int32,
        tp uint8 | zeros).

        With `batch` given, returns an AOT-compiled executable for that
        exact batch size instead of the jit wrapper — prewarm compiles
        via shape structs (never allocating a second full-size pred
        buffer next to the live one) and the dispatch loop then calls
        the same cached executable."""
        if batch is not None:
            ckey = ("ppdevc", shape, batch, exact, self._pred_dev.shape)
            if ckey not in self._fwd_fns:
                self._fwd_fns[ckey] = self._pp_windows_fn(
                    shape, exact=exact).lower(
                    jax.ShapeDtypeStruct(self._pred_dev.shape,
                                         self._pred_dev.dtype),
                    jax.ShapeDtypeStruct((batch, 2), jnp.int32),
                    jax.ShapeDtypeStruct((batch, 4), jnp.int32),
                    jax.ShapeDtypeStruct((2,), jnp.int32),
                ).compile()
            return self._fwd_fns[ckey]
        key = ("ppdev", shape, exact)
        if key not in self._fwd_fns:
            hc, wc = shape
            typed = self.nr_types is not None

            def tail(wins, starts, boxes, img_hw):
                """windows [B,hc,wc,ch] f32 -> (inst u16, nlab, tp)."""
                ri = jax.lax.broadcasted_iota(jnp.int32, (1, hc, wc), 1)
                ci = jax.lax.broadcasted_iota(jnp.int32, (1, hc, wc), 2)
                # zero the outside-slide region (the buffer's slack rows
                # hold scatter dustbin garbage), matching the host
                # staging path's zero fill exactly — minmax_norm context
                # must agree between the two paths
                s = starts[:, :, None, None]  # [B, 2, 1, 1]
                inimg = ((ri + s[:, 0] < img_hw[0])
                         & (ci + s[:, 1] < img_hw[1]))
                wins = jnp.where(inimg[..., None], wins, 0.0)
                seg = wins[..., 1:4] if typed else wins[..., 0:3]
                b = boxes[:, :, None, None]  # [B, 4, 1, 1]
                valid = ((ri >= b[:, 0]) & (ri < b[:, 1])
                         & (ci >= b[:, 2]) & (ci < b[:, 3]))
                inst, nlab = _compact_u16(
                    proc_np_hv_batch(seg, valid, exact=exact))
                tp = (wins[..., 0].astype(jnp.uint8) if typed
                      else jnp.zeros(wins.shape[:3], jnp.uint8))
                return inst, nlab, tp

            if self.mesh is None:

                @jax.jit
                def pp(buf, starts, boxes, img_hw):
                    def slice_one(s):
                        return jax.lax.dynamic_slice(
                            buf, (s[0], s[1], 0), (hc, wc, buf.shape[-1])
                        )

                    # measured: vmapped dynamic_slice == unrolled slices
                    # (24 vs 25 ms for 4x2048^2 from an 8192^2 buffer)
                    wins = jax.vmap(slice_one)(starts).astype(jnp.float32)
                    return tail(wins, starts, boxes, img_hw)

            else:
                # striped buffer: every chip gathers each window's
                # overlap with its OWN core rows (column slice is local;
                # rows via a clamped+masked gather), then one
                # psum_scatter over ICI hands each chip its batch
                # shard's fully-assembled windows — core rows are
                # disjoint, so the sum composes exact stripes. The
                # whole post-proc tail then runs per-chip inside the
                # same shard_map (the Pallas tail kernel cannot be
                # GSPMD-partitioned).
                from jax.sharding import PartitionSpec as P

                s_rows, h_halo = self._stripe

                def pp_local(buf, starts, boxes, img_hw):
                    d = jax.lax.axis_index("data")
                    row0 = d * s_rows

                    def one(s):
                        cols = jax.lax.dynamic_slice(
                            buf, (0, s[1], 0),
                            (buf.shape[0], wc, buf.shape[-1]),
                        )
                        idx = (s[0] + jnp.arange(hc, dtype=jnp.int32)
                               - row0 + h_halo)
                        inb = (idx >= h_halo) & (idx < h_halo + s_rows)
                        g = jnp.take(
                            cols, jnp.clip(idx, 0, buf.shape[0] - 1),
                            axis=0,
                        )
                        return jnp.where(
                            inb[:, None, None], g,
                            jnp.zeros((), buf.dtype),
                        )

                    wins = jax.vmap(one)(starts)
                    wins = jax.lax.psum_scatter(
                        wins, "data", scatter_dimension=0, tiled=True)
                    bn = wins.shape[0]
                    st = jax.lax.dynamic_slice_in_dim(starts, d * bn, bn, 0)
                    bx = jax.lax.dynamic_slice_in_dim(boxes, d * bn, bn, 0)
                    return tail(wins.astype(jnp.float32), st, bx, img_hw)

                inner = shard_map_compat(
                    pp_local, self.mesh, (P("data"), P(), P(), P()),
                    (P("data"), P("data"), P("data")),
                )
                rsh = batch_sharding(self.mesh)
                rep = replicated(self.mesh)
                bsh = batch_sharding(self.mesh)
                pp = jax.jit(
                    inner,
                    in_shardings=(rsh, rep, rep, rep),
                    out_shardings=(bsh, bsh, bsh),
                )

            self._fwd_fns[key] = pp
        return self._fwd_fns[key]

    def _alloc_pred_dev(self, out_ch: int):
        """Allocate the HBM-resident pred buffer and set
        ``_pred_dev`` / ``_stripe``.

        Single device: one zeroed (Bh, Bw, C) block, 256-aligned with
        one patch-output of slack per axis (covers every canonical
        window class, edge patch overruns, and the padded-batch scatter
        dustbin). Mesh: row-striped over the devices — each chip owns S
        core rows plus _STRIPE_HALO landing rows on either side, so a
        patch output straddling a stripe boundary lands whole in both
        neighbours' buffers (each core row is written by exactly its
        owner; halo copies are dead). Window reads gather core rows
        only and psum_scatter windows to their batch owners (see
        _scatter_fn / _pp_windows_fn mesh branches)."""
        proc_shape = tuple(int(v) for v in self.wsi_proc_shape)
        out_sz = self.cfg.patch_output_shape
        bh = -(-(proc_shape[0] + out_sz) // 256) * 256
        bw = -(-(proc_shape[1] + out_sz) // 256) * 256
        dt = (jnp.float16 if self.pred_map_dtype == np.float16
              else jnp.float32)
        if self.mesh is None:
            self._stripe = None
            self._pred_dev = jnp.zeros((bh, bw, out_ch), dt)
        else:
            halo = _STRIPE_HALO
            assert halo >= out_sz, (halo, out_sz)
            s_rows = -(-(-(-bh // self.n_devices)) // 256) * 256
            self._stripe = (s_rows, halo)
            shape = (self.n_devices * (s_rows + 2 * halo), bw, out_ch)
            self._pred_dev = jax.jit(
                lambda: jnp.zeros(shape, dt),
                out_shardings=batch_sharding(self.mesh),
            )()
        self._pred_dev_mode = True

    def _prewarm_post_proc(self):
        """Compile + first-load every canonical post-proc window program
        on zero inputs (no prediction data needed). Runs on a side
        thread concurrent with the chunk-inference loop; jit dispatch is
        thread-safe and the warm inputs are private, so there is no
        interaction with the scatter chain's donated buffers."""
        try:
            tg, tb, tc = wsi_tile_grids(
                self.wsi_proc_shape, np.array([self.tile_shape] * 2),
                self.ambiguous_size,
            )
            shapes = dict()
            for boxes in (tg, tb, tc):
                for idx in range(boxes.shape[0]):
                    tl, br = boxes[idx]
                    if (br - tl).min() <= 0:
                        # degenerate clipped box (e.g. a boundary strip
                        # on a tile edge coinciding with the slide edge)
                        # — the dispatch loop skips these too
                        continue
                    _, shape = self._canonical_window(tl, br)
                    shapes[shape] = True
            batch = 4 * self.n_devices
            img_hw = jnp.asarray(
                [int(v) for v in self.wsi_proc_shape], jnp.int32)
            for (hc, wc) in shapes:
                if self._pred_dev_mode:
                    # AOT compile on shape structs: warming with a real
                    # zeros buffer would allocate a SECOND full-size
                    # pred map concurrently with chunk inference (~2x
                    # the budget -> OOM risk); the dispatch loop calls
                    # this same cached executable
                    self._pp_windows_fn((hc, wc), batch)
                    continue
                else:
                    dt = (jnp.float16
                          if self.pred_map_dtype == np.float16
                          else jnp.float32)
                    out = self._post_proc_fn()(
                        jnp.zeros((batch, hc, wc, 3), dt),
                        jnp.zeros((batch, hc, wc), bool),
                    )
                jax.block_until_ready(out)
        except Exception:
            logger.exception("post-proc prewarm failed (non-fatal)")

    def _get_raw_prediction(self, chunk_info, patch_info):
        """Chunk loop: read region -> device forward -> writer thread
        assembles into the pred_map mmap (infer/wsi.py:329-383); in
        HBM-resident mode the outputs scatter straight into the device
        buffer instead (no D2H)."""
        write_q: "queue.Queue" = queue.Queue(maxsize=4)

        def writer():
            if self._pred_dev_mode:
                return
            pred_map = np.load(self._pred_map_path, mmap_mode="r+")
            while True:
                item = write_q.get()
                if item is None:
                    break
                out_tl, dev_outs, coords = item
                # pull device handles here: transfers overlap with the
                # main thread's next-chunk dispatches
                outputs = np.concatenate(
                    [np.asarray(o)[:n] for o, n in dev_outs], axis=0
                )
                for k in range(len(coords)):
                    y, x = coords[k]
                    ph, pw = outputs.shape[1:3]
                    pred_map[y : y + ph, x : x + pw] = outputs[k]
                del outputs
            pred_map.flush()

        wt = threading.Thread(target=writer, daemon=True)
        wt.start()

        def read_chunk(idx):
            """Host side of one chunk: mask-select patches + slide read
            + the H2D push. Runs on a prefetch thread so chunk k+1's
            read AND transfer overlap chunk k's device dispatches (and
            the writer's pulls) — double-buffered pushes instead of the
            dispatch loop blocking on a synchronous transfer."""
            cinfo = chunk_info[idx]
            sub = select_patches_in_chunk(
                patch_info, cinfo, (self.cfg.patch_input_shape,) * 2
            )
            sub = self._select_masked_patches(sub)
            if sub.shape[0] == 0:
                return None
            tl = cinfo[0, 0]
            read_size = (cinfo[0, 1] - cinfo[0, 0])[::-1]  # (w, h)
            chunk_img = self.wsi_handler.read_region(tl[::-1], read_size)
            rel_in_tl = (sub[:, 0, 0] - tl).astype(np.int32)
            return tl, self._push_chunk(chunk_img), rel_in_tl, sub[:, 1, 0]

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        n_chunks = chunk_info.shape[0]
        with ThreadPoolExecutor(max_workers=1) as ex:
            futs = deque(
                ex.submit(read_chunk, i) for i in range(min(2, n_chunks))
            )
            for idx in range(n_chunks):
                item = futs.popleft().result()
                if idx + 2 < n_chunks:
                    futs.append(ex.submit(read_chunk, idx + 2))
                if item is None:
                    continue
                tl, chunk_img, rel_in_tl, out_coords = item
                if self._pred_dev_mode:
                    self._run_chunk(chunk_img, rel_in_tl, out_coords)
                else:
                    outputs = self._run_chunk(chunk_img, rel_in_tl)
                    write_q.put((tl, outputs, out_coords))
                logger.info("chunk %d/%d: %d patches", idx + 1,
                            n_chunks, rel_in_tl.shape[0])
        write_q.put(None)
        wt.join()
        if self._pred_dev_mode:
            jax.block_until_ready(self._pred_dev)

    def _boxes_touch_tissue(self, scaled_boxes):
        """Vectorized tissue-overlap test via a summed-area table of the
        mask: one O(mask) cumsum (cached per slide) + 4 gathers per box,
        replacing the reference's per-box Python ROI sums
        (infer/wsi.py:300-327) — those cost minutes of host time at
        ~372k patch boxes on a 100k x 80k slide."""
        mh, mw = self.wsi_mask.shape[:2]
        if self._mask_integral is None or \
                self._mask_integral.shape != (mh + 1, mw + 1):
            ii = np.zeros((mh + 1, mw + 1), np.int64)
            np.cumsum((self.wsi_mask > 0).cumsum(axis=0), axis=1,
                      out=ii[1:, 1:])
            self._mask_integral = ii
        ii = self._mask_integral
        r0 = np.clip(scaled_boxes[:, 0, 0], 0, mh)
        r1 = np.clip(scaled_boxes[:, 1, 0], 0, mh)
        c0 = np.clip(scaled_boxes[:, 0, 1], 0, mw)
        c1 = np.clip(scaled_boxes[:, 1, 1], 0, mw)
        area = ii[r1, c1] - ii[r0, c1] - ii[r1, c0] + ii[r0, c0]
        return area > 0

    def _select_masked_patches(self, patch_info, box_level: int = 1):
        """Keep patches whose output box overlaps tissue."""
        if patch_info.shape[0] == 0:
            return patch_info
        ratio = self.wsi_mask.shape[0] / self.wsi_proc_shape[0]
        boxes = np.rint(patch_info[:, box_level] * ratio).astype(np.int64)
        return patch_info[self._boxes_touch_tissue(boxes)]

    def _select_masked_boxes(self, boxes):
        if boxes.shape[0] == 0:
            return boxes
        ratio = self.wsi_mask.shape[0] / self.wsi_proc_shape[0]
        scaled = np.rint(boxes * ratio).astype(np.int64)
        return boxes[self._boxes_touch_tissue(scaled)]

    # ------------------------------------------------ tile post-process

    def _canonical_window(self, tl, br):
        """Round the read window up to a shape class; anchor inside the
        slide; return (win_tl, (Hc, Wc), valid slice of requested box)."""
        h, w = int(br[0] - tl[0]), int(br[1] - tl[1])
        img_h, img_w = (int(v) for v in self.wsi_proc_shape)
        hc = min(-(-h // 256) * 256, -(-img_h // 256) * 256)
        wc = min(-(-w // 256) * 256, -(-img_w // 256) * 256)
        wy = max(min(int(tl[0]), img_h - hc), 0)
        wx = max(min(int(tl[1]), img_w - wc), 0)
        return (wy, wx), (hc, wc)

    def _window_geom(self, tl, br):
        """Canonical window anchor/shape + requested box clipped to the
        in-slide part of the window (zero-padding can never be claimed
        as valid output — boundary boxes may overrun, or miss, the
        slide entirely)."""
        (wy, wx), (hc, wc) = self._canonical_window(tl, br)
        img_h, img_w = (int(v) for v in self.wsi_proc_shape)
        read_h, read_w = min(hc, img_h - wy), min(wc, img_w - wx)
        y0 = min(max(int(tl[0]) - wy, 0), read_h)
        y1 = min(max(int(br[0]) - wy, 0), read_h)
        x0 = min(max(int(tl[1]) - wx, 0), read_w)
        x1 = min(max(int(br[1]) - wx, 0), read_w)
        return (wy, wx), (hc, wc), (read_h, read_w), (y0, y1, x0, x1)

    def _read_window(self, pred_map, tl, br):
        """Read one canonical padded window + validity geometry."""
        (wy, wx), (hc, wc), (read_h, read_w), geom = self._window_geom(tl, br)
        # stage windows in the mmap's dtype (f16 by default): halves the
        # host->device push; the post-proc kernel casts to f32 on device
        window = np.zeros((hc, wc, pred_map.shape[-1]), pred_map.dtype)
        window[:read_h, :read_w] = pred_map[wy : wy + read_h, wx : wx + read_w]
        valid = np.zeros((hc, wc), bool)
        y0, y1, x0, x1 = geom
        valid[y0:y1, x0:x1] = True
        return window, valid, geom

    def _post_proc_box(self, tl, br, exact: bool = False):
        """Device post-proc of one box; returns (inst int32, type int32)
        with labels remapped contiguously. Single-box convenience path
        (tests) and, with exact=True, the seam-guard fallback the
        dispatch loop uses to re-solve a flagged window via the all-XLA
        scan path."""
        if self._pred_dev_mode:
            (wy, wx), (hc, wc), _, geom = self._window_geom(tl, br)
            y0, y1, x0, x1 = geom
            img_hw = jnp.asarray(
                [int(v) for v in self.wsi_proc_shape], jnp.int32)
            # mesh: the shard_map batch must divide over devices —
            # duplicate the single window (extras sliced off below)
            reps = self.n_devices if self.mesh is not None else 1
            inst_dev, nlab_dev, tp_dev = self._pp_windows_fn(
                (hc, wc), exact=exact)(
                self._pred_dev, jnp.asarray([(wy, wx)] * reps, jnp.int32),
                jnp.asarray([geom] * reps, jnp.int32), img_hw,
            )
            _warn_u16_overflow(nlab_dev[:1])
            inst = remap_label(
                np.asarray(inst_dev)[0, y0:y1, x0:x1].astype(np.int32))
            tp = (np.asarray(tp_dev)[0, y0:y1, x0:x1].astype(np.int32)
                  if self.nr_types is not None else None)
            return inst, tp
        pred_map = np.load(self._pred_map_path, mmap_mode="r")
        window, valid, (y0, y1, x0, x1) = self._read_window(pred_map, tl, br)
        seg = window[..., 1:4] if self.nr_types is not None else window[..., 0:3]
        inst = proc_np_hv_batch(jnp.asarray(seg[None]),
                                jnp.asarray(valid[None]), exact=exact)[0]
        inst = remap_label(np.asarray(inst)[y0:y1, x0:x1])
        tp = (window[..., 0].astype(np.int32)[y0:y1, x0:x1]
              if self.nr_types is not None else None)
        return inst, tp

    def _dispatch_post_processing(self, boxes, callback, desc,
                                  batch: int = 4, inflight: int = 2):
        batch = batch * self.n_devices
        """Batched + software-pipelined device post-processing.

        Boxes are grouped by canonical window shape, dispatched to the
        device `batch` windows at a time with `inflight` batches queued
        (hides dispatch + transfer latency). Host callbacks run
        sequentially as each batch completes — completion order within
        a phase, like the reference's `as_completed` polling
        (infer/wsi.py:423); only the phase barriers are ordered.
        """
        start = time.perf_counter()
        pred_map = (None if self._pred_dev_mode
                    else np.load(self._pred_map_path, mmap_mode="r"))

        # group box indices by canonical window shape (keeps one
        # compiled program per shape class, batches within a class)
        groups: Dict[tuple, list] = {}
        for idx in range(boxes.shape[0]):
            tl, br = boxes[idx]
            in_tl = np.maximum(tl, 0)
            in_br = np.minimum(br, np.asarray(self.wsi_proc_shape))
            if (in_br - in_tl).min() <= 0:
                # no in-slide pixels: the grid generator mirrors the
                # reference's floor+1 step count (infer/wsi.py:74), which
                # emits a zero-area trailing row/column when the slide is
                # an exact tile multiple — and the boundary/cross strips
                # hung off that phantom row lie entirely outside the slide
                continue
            _, shape = self._canonical_window(tl, br)
            groups.setdefault(shape, []).append(idx)

        typed = self.nr_types is not None
        img_hw = jnp.asarray(
            [int(v) for v in self.wsi_proc_shape], jnp.int32)

        def finalize(item):
            from ..ops.post_proc_device import seam_suspects

            idxs, inst_dev, nlab_dev, geoms, tps, was_exact = item
            _warn_u16_overflow(nlab_dev)
            inst_host = np.asarray(inst_dev).astype(np.int32, copy=False)
            win_hw = inst_host.shape[1:3]
            if tps is not None and not isinstance(tps, list):
                # device-mode: tp windows pulled as one uint8 stack
                tp_host = np.asarray(tps)
                tps = [
                    tp_host[k, g[0]:g[1], g[2]:g[3]].astype(np.int32)
                    if typed else None
                    for k, g in enumerate(geoms)
                ]

            def extract_one(k):
                y0, y1, x0, x1 = geoms[k]
                inst = remap_label(inst_host[k, y0:y1, x0:x1])
                return extract_instance_info(inst, tps[k])

            # per-window extraction (remap + the native stats/contour
            # passes — ctypes calls release the GIL) fans out on the
            # finalize pool; the MUTATING callbacks below stay strictly
            # sequential, preserving the phase algebra's ordering
            if ext_pool is not None and len(idxs) > 1:
                extracted = list(ext_pool.map(extract_one,
                                              range(len(idxs))))
            else:
                extracted = [extract_one(k) for k in range(len(idxs))]
            for k, idx in enumerate(idxs):
                y0, y1, x0, x1 = geoms[k]
                inst, inst_info = extracted[k]
                tl, br = boxes[idx]
                if inst_info and not was_exact:
                    # seam guard: instances violating the blocked
                    # kernel's halo bound re-solve this window via the
                    # exact scan path (bboxes shifted back to window
                    # coords — the gridlines live on the full window)
                    bb = np.array(
                        [[v["bbox"][0][0] + y0, v["bbox"][1][0] + y0,
                          v["bbox"][0][1] + x0, v["bbox"][1][1] + x0]
                         for v in inst_info.values()])
                    sus = seam_suspects(bb, *win_hw)
                    if sus.any():
                        logger.warning(
                            "seam guard: %d instance(s) exceed the "
                            "blocked kernel's halo bound in window "
                            "%s–%s — re-solving exactly",
                            int(sus.sum()), tl.tolist(), br.tolist())
                        inst2, tp2 = self._post_proc_box(tl, br,
                                                         exact=True)
                        inst, inst_info = extract_instance_info(
                            inst2, tp2)
                        self._seam_refines += 1
                        if (self._seam_refines >= self._SEAM_REFINE_CAP
                                and not self._force_exact):
                            self._force_exact = True
                            logger.error(
                                "seam guard tripped %d times — the "
                                "prediction is degenerate (giant "
                                "merged components everywhere, far "
                                "outside the nuclei contract). "
                                "Switching this slide's remaining "
                                "post-proc to the exact scan path "
                                "directly.", self._seam_refines)
                callback(inst, inst_info, tl, br)

        batches = [(shape, idxs[i : i + batch])
                   for shape, idxs in groups.items()
                   for i in range(0, len(idxs), batch)]

        def stage_mmap(sub):
            """Host side of one mmap-path batch: window reads (disk) +
            validity masks. Runs on the prefetch thread so batch k+1's
            mmap reads overlap batch k's device execution — the mmap
            path's analog of the resident path's zero-H2D slicing
            (VERDICT r2: the over-HBM path used to stage windows
            synchronously)."""
            wins, valids, geoms, tps = [], [], [], []
            for idx in sub:
                tl, br = boxes[idx]
                window, valid, geom = self._read_window(pred_map, tl, br)
                wins.append(window[..., 1:4] if typed
                            else window[..., 0:3])
                valids.append(valid)
                geoms.append(geom)
                y0, y1, x0, x1 = geom
                tps.append(
                    window[..., 0].astype(np.int32)[y0:y1, x0:x1]
                    if typed else None
                )
            if len(sub) < batch:
                pad = batch - len(sub)
                wins += [np.zeros_like(wins[0])] * pad
                valids += [np.zeros_like(valids[0])] * pad
            # push from the staging thread (double-buffered): the
            # dispatch loop then never blocks on the window transfer —
            # batch k+1's H2D streams while batch k's kernel runs.
            # Mesh runs shard the batch axis here so jit sees the
            # layout its in_shardings expect (no reshard on dispatch).
            sh = batch_sharding(self.mesh) if self.mesh is not None else None
            push = ((lambda a: jax.device_put(a, sh)) if sh is not None
                    else jnp.asarray)
            return (push(np.stack(wins)), push(np.stack(valids)),
                    geoms, tps)

        def dispatch(shape, sub, staged):
            n = len(sub)
            was_exact = self._force_exact
            if self._pred_dev_mode:
                starts, rel_boxes, geoms = [], [], []
                for idx in sub:
                    tl, br = boxes[idx]
                    (wy, wx), _, _, geom = self._window_geom(tl, br)
                    starts.append((wy, wx))
                    rel_boxes.append(geom)
                    geoms.append(geom)
                if n < batch:  # repeat the last window (sliced off)
                    starts += [starts[-1]] * (batch - n)
                    rel_boxes += [rel_boxes[-1]] * (batch - n)
                inst_dev, nlab_dev, tp_dev = self._pp_windows_fn(
                    shape, exact=was_exact)(
                    self._pred_dev,
                    jnp.asarray(starts, jnp.int32),
                    jnp.asarray(rel_boxes, jnp.int32),
                    img_hw,
                )
                inst_dev = inst_dev[:n]
                nlab_dev = nlab_dev[:n]
                tps = tp_dev[:n] if typed else [None] * n
            else:
                wins, valids, geoms, tps = staged
                # wins/valids were pushed by the staging thread two
                # batches ahead — already device-resident here
                inst_dev, nlab_dev = self._post_proc_fn(exact=was_exact)(
                    wins, valids
                )
                inst_dev = inst_dev[:n]
                nlab_dev = nlab_dev[:n]
            try:  # overlap the D2H pull with later dispatches
                inst_dev.copy_to_host_async()
            except AttributeError:
                pass
            return (sub, inst_dev, nlab_dev, geoms, tps, was_exact)

        pending = []
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        # host-finalize pool: per-window extraction is independent and
        # CPU-bound; pool size follows the host's cores (the at-scale
        # host stage is ~21 ms per 1.3 Mpx PER CORE). Callbacks never
        # run on it — only the pure remap/stats/contour passes do.
        n_fin = getattr(self, "finalize_workers", 0) or min(
            8, os.cpu_count() or 1)
        ext_pool = (ThreadPoolExecutor(max_workers=n_fin)
                    if n_fin > 1 else None)
        try:
            with ThreadPoolExecutor(max_workers=1) as ex:
                futs = deque()
                if not self._pred_dev_mode:
                    for _, sub in batches[:2]:
                        futs.append(ex.submit(stage_mmap, sub))
                for i, (shape, sub) in enumerate(batches):
                    staged = None
                    if not self._pred_dev_mode:
                        staged = futs.popleft().result()
                        if i + 2 < len(batches):
                            futs.append(
                                ex.submit(stage_mmap, batches[i + 2][1]))
                    pending.append(dispatch(shape, sub, staged))
                    while len(pending) > inflight:
                        finalize(pending.pop(0))
            while pending:
                finalize(pending.pop(0))
        finally:
            if ext_pool is not None:
                # wait=True: on the happy path map() has already
                # drained (free); on an exception no extraction thread
                # may outlive the phase and race the unwinding caller's
                # buffers (ADVICE r4)
                ext_pool.shutdown(wait=True)
        logger.info("%s: %d boxes in %.2fs", desc, boxes.shape[0],
                    time.perf_counter() - start)

    # -------------------------------------------------------- full run

    def process_single_file(self, wsi_path, msk_path, output_dir):
        ext = pathlib.Path(wsi_path).suffix
        wsi_name = pathlib.Path(wsi_path).stem
        os.makedirs(self.cache_path, exist_ok=True)
        self._seam_refines = 0
        self._force_exact = False

        start = time.perf_counter()
        self.wsi_handler = get_file_handler(wsi_path, backend=ext)
        self.wsi_proc_shape = self.wsi_handler.get_dimensions(self.proc_mag)
        self.wsi_handler.prepare_reading(
            read_mag=self.proc_mag,
            cache_path=f"{self.cache_path}/src_wsi.npy",
        )
        self.wsi_proc_shape = np.array(self.wsi_proc_shape[::-1])  # (y, x)

        if msk_path is not None and os.path.isfile(msk_path):
            mask = cv2.cvtColor(cv2.imread(msk_path), cv2.COLOR_BGR2GRAY)
            self.wsi_mask = (mask > 0).astype(np.uint8)
        else:
            logger.warning("no mask found, generating via Otsu at 1.25x")
            self.wsi_mask = _simple_tissue_mask(self.wsi_handler).astype(np.uint8)
        if self.wsi_mask.sum() == 0:
            logger.info("skip due to empty mask")
            return
        if getattr(self, "save_mask", False):
            cv2.imwrite(f"{output_dir}/mask/{wsi_name}.png", self.wsi_mask * 255)
        if getattr(self, "save_thumb", False):
            thumb = self.wsi_handler.get_full_img(read_mag=1.25)
            cv2.imwrite(f"{output_dir}/thumb/{wsi_name}.png",
                        cv2.cvtColor(thumb, cv2.COLOR_RGB2BGR))

        out_ch = 4 if self.nr_types is not None else 3
        proc_shape = tuple(int(v) for v in self.wsi_proc_shape)
        pred_bytes = (proc_shape[0] * proc_shape[1] * out_ch
                      * self.pred_map_dtype.itemsize)
        # the budget is per chip: a mesh holds the buffer row-striped,
        # so n chips carry n budgets worth of pred map
        self._pred_dev_mode = (
            pred_bytes <= self.hbm_pred_budget * self.n_devices)
        if self._pred_dev_mode:
            self._alloc_pred_dev(out_ch)
            self._pred_map_path = None
            logger.info(
                "pred map resident in HBM (%.2f GB%s)", pred_bytes / 2**30,
                f", striped over {self.n_devices} chips"
                if self.mesh is not None else "",
            )
        else:
            self._pred_map_path = f"{self.cache_path}/pred_map.npy"
            pred_map = np.lib.format.open_memmap(
                self._pred_map_path, mode="w+",
                shape=proc_shape + (out_ch,), dtype=self.pred_map_dtype,
            )
            del pred_map
        self.wsi_inst_map = np.lib.format.open_memmap(
            f"{self.cache_path}/pred_inst.npy", mode="w+",
            shape=proc_shape, dtype=np.int32,
        )
        self.wsi_inst_info: Dict[int, dict] = {}
        logger.info("prepare holders: %.2fs", time.perf_counter() - start)

        # ---- raw prediction over chunks
        start = time.perf_counter()
        chunk_info, patch_info = wsi_chunk_patch_grids(
            self.wsi_proc_shape,
            np.array([self.chunk_shape] * 2),
            np.array([self.cfg.patch_input_shape] * 2),
            np.array([self.cfg.patch_output_shape] * 2),
        )
        # pre-build the post-proc window programs on a side thread while
        # the chunk loop runs: the first program load of a process can
        # cost minutes on remote-compile links, and every canonical
        # window class is known before any prediction exists
        warm = threading.Thread(target=self._prewarm_post_proc, daemon=True)
        warm.start()
        self._get_raw_prediction(chunk_info, patch_info)
        logger.info("inference: %.2fs", time.perf_counter() - start)
        warm.join()

        # ---- 3-phase post-processing
        start = time.perf_counter()
        tile_grid, tile_boundary, tile_cross = wsi_tile_grids(
            self.wsi_proc_shape, np.array([self.tile_shape] * 2),
            self.ambiguous_size,
        )
        tile_grid = self._select_masked_boxes(tile_grid)
        tile_boundary = self._select_masked_boxes(tile_boundary)
        tile_cross = self._select_masked_boxes(tile_cross)

        self._dispatch_post_processing(
            tile_grid, self._cb_normal_tile, "post-proc phase 1"
        )
        self._dispatch_post_processing(
            tile_boundary, self._cb_fixing_tile, "post-proc phase 2"
        )
        self._dispatch_post_processing(
            tile_cross, self._cb_fixing_tile, "post-proc phase 3"
        )
        logger.info("post-proc: %.2fs", time.perf_counter() - start)

        start = time.perf_counter()
        if getattr(self, "save_mask", False) or getattr(self, "save_thumb", False):
            json_path = f"{output_dir}/json/{wsi_name}.json"
        else:
            json_path = f"{output_dir}/{wsi_name}.json"
        base.save_json(json_path, self.wsi_inst_info, mag=self.proc_mag)
        logger.info("save: %.2fs", time.perf_counter() - start)
        self._pred_dev = None  # free HBM before the next slide

    # ---- phase callbacks (infer/wsi.py:569-677 bookkeeping)

    def _cb_normal_tile(self, pred_inst, inst_info, tl, br):
        if len(inst_info) == 0:
            return
        top_left = np.array([tl[1], tl[0]])  # (x, y)
        wsi_max_id = max(self.wsi_inst_info.keys(), default=0)
        for inst_id, info in inst_info.items():
            info["bbox"] += np.asarray(tl)  # bbox rows are (y, x)
            info["contour"] += top_left
            info["centroid"] += top_left
            self.wsi_inst_info[inst_id + wsi_max_id] = info
        pred_inst = np.where(pred_inst > 0, pred_inst + wsi_max_id, 0)
        self.wsi_inst_map[tl[0] : br[0], tl[1] : br[1]] = pred_inst

    def _cb_fixing_tile(self, pred_inst, inst_info, tl, br):
        if len(inst_info) == 0:
            return
        top_left = np.array([tl[1], tl[0]])
        wsi_max_id = max(self.wsi_inst_info.keys(), default=0)

        # keep old nuclei that straddle this window's boundary; drop the
        # interior ones (they will be replaced by the re-prediction)
        roi = np.array(self.wsi_inst_map[tl[0] : br[0], tl[1] : br[1]])
        edge_ids = np.unique(np.concatenate([
            roi[[0, -1], :].ravel(), roi[:, [0, -1]].ravel()
        ]))
        edge_ids = edge_ids[edge_ids > 0]
        inner_ids = np.setdiff1d(np.unique(roi)[1:], edge_ids,
                                 assume_unique=True)
        roi[np.isin(roi, inner_ids)] = 0
        self.wsi_inst_map[tl[0] : br[0], tl[1] : br[1]] = roi
        for inst_id in inner_ids:
            self.wsi_inst_info.pop(int(inst_id), None)

        # from the new prediction, drop nuclei overlapping the kept old
        # boundary-straddlers; install the rest
        overlap_ids = np.unique(pred_inst[roi > 0])
        new_inner = np.setdiff1d(np.unique(pred_inst)[1:], overlap_ids,
                                 assume_unique=True)
        pred_inst = np.where(np.isin(pred_inst, overlap_ids), 0, pred_inst)
        for inst_id in new_inner:
            if inst_id not in inst_info:
                logger.info("nucleus id=%d missing from info dict", inst_id)
                continue
            info = inst_info[inst_id]
            info["bbox"] += np.asarray(tl)
            info["contour"] += top_left
            info["centroid"] += top_left
            self.wsi_inst_info[int(inst_id) + wsi_max_id] = info
        pred_inst = np.where(pred_inst > 0, pred_inst + wsi_max_id, 0)
        self.wsi_inst_map[tl[0] : br[0], tl[1] : br[1]] = roi + pred_inst

    # -------------------------------------------------------------- run

    def process_wsi_list(self, input_dir, output_dir, input_mask_dir=None,
                         save_thumb=False, save_mask=False):
        self.save_thumb = save_thumb
        self.save_mask = save_mask
        os.makedirs(self.cache_path, exist_ok=True)
        os.makedirs(f"{output_dir}/json", exist_ok=True)
        if save_thumb:
            os.makedirs(f"{output_dir}/thumb", exist_ok=True)
        if save_mask:
            os.makedirs(f"{output_dir}/mask", exist_ok=True)

        for wsi_path in sorted(glob.glob(f"{input_dir}/*")):
            if os.path.isdir(wsi_path):
                continue
            name = pathlib.Path(wsi_path).stem
            msk_path = (f"{input_mask_dir}/{name}.png"
                        if input_mask_dir else None)
            out_file = (f"{output_dir}/json/{name}.json"
                        if (save_thumb or save_mask)
                        else f"{output_dir}/{name}.json")
            if os.path.exists(out_file):
                logger.info("skip (resume): %s", name)
                continue
            try:
                logger.info("process: %s", name)
                self.process_single_file(wsi_path, msk_path, output_dir)
                logger.info("finish %s", name)
            except Exception:
                logger.exception("crash on %s", name)
            finally:
                self._pred_dev = None  # free HBM even on failure
        shutil.rmtree(self.cache_path, ignore_errors=True)


def _dryrun_striped_once(n_devices: int, pred, shape):
    """Scatter a pre-built pred map into the striped (or single-device)
    HBM-resident buffer and run all 3 post-proc phases. Returns
    (inst_map, inst_info_keys)."""
    from ..data.tiling import wsi_tile_grids
    from ..models import HoVerNetConfig
    from ..parallel.mesh import make_mesh

    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=8)
    out_sz = cfg.patch_output_shape
    ys = list(range(0, shape[0], out_sz))
    xs = list(range(0, shape[1], out_sz))
    padded = np.zeros((ys[-1] + out_sz, xs[-1] + out_sz, 3), np.float16)
    padded[: shape[0], : shape[1]] = pred
    coords = np.array([(y, x) for y in ys for x in xs], np.int32)
    patches = np.stack([padded[y:y + out_sz, x:x + out_sz]
                        for y, x in coords])

    mgr = WSIInferManager.__new__(WSIInferManager)
    mgr.cfg = cfg
    mgr.nr_types = None
    mgr.tile_shape = 128
    mgr.ambiguous_size = 32
    mgr.pred_map_dtype = np.dtype("float16")
    mgr.mesh = make_mesh(n_devices) if n_devices > 1 else None
    mgr.n_devices = n_devices
    mgr._fwd_fns = {}
    mgr._pp_fn = None
    mgr.wsi_proc_shape = np.array(shape)
    mgr.wsi_mask = np.ones((30, 26), np.uint8)
    mgr.wsi_inst_info = {}
    mgr.wsi_inst_map = np.zeros(shape, np.int32)
    mgr._alloc_pred_dev(3)
    assert mgr._pred_dev_mode
    if n_devices > 1:
        assert mgr._stripe is not None

    scatter = mgr._scatter_fn()
    dustbin = np.array(mgr._pred_dev.shape[:2], np.int32)
    bs = max(n_devices, 8)
    for i in range(0, len(coords), bs):
        sub = coords[i:i + bs]
        outs = patches[i:i + bs]
        if len(sub) < bs:
            pad = bs - len(sub)
            sub = np.concatenate([sub, np.broadcast_to(dustbin, (pad, 2))])
            outs = np.concatenate(
                [outs, np.zeros((pad,) + outs.shape[1:], outs.dtype)])
        mgr._pred_dev = scatter(
            mgr._pred_dev, jnp.asarray(outs), jnp.asarray(sub))

    tg, tb, tc = wsi_tile_grids(np.array(shape), np.array([128, 128]), 32)
    mgr._dispatch_post_processing(tg, mgr._cb_normal_tile, "p1")
    mgr._dispatch_post_processing(tb, mgr._cb_fixing_tile, "p2")
    mgr._dispatch_post_processing(tc, mgr._cb_fixing_tile, "p3")
    return mgr.wsi_inst_map.copy(), set(mgr.wsi_inst_info.keys())


def dryrun_striped_infer(n_devices: int) -> dict:
    """One striped scatter + window-gather round over an n-device mesh
    on tiny shapes — validates the multi-chip WSI inference collectives
    (all_gather patch scatter, psum_scatter window reads, shard_map'd
    post-proc) compile AND execute, the way dryrun_train_step does for
    the training collectives, AND that they are CORRECT: the identical
    input also runs through the single-device resident path and the
    instance maps must match bit-exactly (VERDICT r4 item 6 — the
    dryrun certifies correctness, not just execution). Driver-facing
    (__graft_entry__).

    Returns {"n_instances": int} from the composed 3-phase run.
    """
    from ..ops.targets import gen_instance_hv_map

    rng = np.random.default_rng(3)
    shape = (300, 260)
    inst_gt = np.zeros(shape, np.int32)
    k = 1
    for _ in range(40):
        cy = int(rng.integers(10, shape[0] - 10))
        cx = int(rng.integers(10, shape[1] - 10))
        r = int(rng.integers(4, 8))
        yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
        m = (yy ** 2 + xx ** 2) <= r * r
        sub = inst_gt[cy - r:cy + r + 1, cx - r:cx + r + 1]
        sub[m & (sub == 0)] = k
        k += 1
    hv = gen_instance_hv_map(inst_gt, shape)
    pred = np.dstack([(inst_gt > 0).astype(np.float32),
                      hv[..., 0], hv[..., 1]]).astype(np.float16)

    inst_n, keys_n = _dryrun_striped_once(n_devices, pred, shape)
    inst_1, keys_1 = _dryrun_striped_once(1, pred, shape)
    np.testing.assert_array_equal(inst_n, inst_1)
    assert keys_n == keys_1, (len(keys_n), len(keys_1))
    n = len(keys_n)
    assert n > 10, f"striped dryrun found only {n} instances"
    print("dryrun_striped_infer: striped == single-device "
          f"(bit-exact instance map, {n} instances)")
    return {"n_instances": n}
