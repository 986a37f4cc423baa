"""Tile inference: directory of images -> mat/json/overlay/qupath outputs.

Capability parity with infer/tile.py in the reference, re-architected as
a device-resident pipeline:

reference                              this framework
---------                              --------------
DataLoader workers slice patches    -> one host->HBM transfer of the
from cached host images                padded image; patch windows are
                                       gathered on device
per-batch .cpu().numpy() round trip -> outputs stay in HBM; the full
                                       prediction map is stitched on
                                       device
ProcessPoolExecutor running            batched on-device post-processing
cv2/scipy watershed per tile        -> (ops/post_proc_device); only the
                                       int32 instance map + uint8 type
                                       map cross back to host
"Silent Crash" future polling       -> per-image try/except with logged
                                       traceback (host work is trivial)

Output contract preserved: mat keys inst_map/inst_uid/inst_type/
inst_centroid(+raw_map), overlay png, QuPath tsv, json nuc dict
(infer/tile.py:170-212).
"""

from __future__ import annotations

import glob
import logging
import pathlib
import re
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import scipy.io as sio

from ..data.tiling import bucket_grid_dim, prepare_tile_patching
from ..ops.post_proc_host import (
    extract_instance_info,
    instance_info_from_tables,
    process as host_process,
)
from ..utils.qupath import to_qupath
from ..utils.viz import overlay_instances
from ..metrics import remap_label
from . import base
from .steps import assemble_grid, extract_patches

logger = logging.getLogger("hover_net_tpu")


def _rm_n_mkdir(path):
    import os
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path)


class TileInferManager(base.InferManagerBase):
    """Runs tile-mode inference. Patch shapes follow the model mode
    (270/80 original, 256/164 fast — run_infer.py:145-150)."""

    def __init__(self, *args, device_post_proc: bool = True,
                 n_devices: int = 1, **kwargs):
        super().__init__(*args, **kwargs)
        self.patch_input_shape = self.cfg.patch_input_shape
        self.patch_output_shape = self.cfg.patch_output_shape
        self.device_post_proc = device_post_proc
        self._pipelines = {}
        # multi-chip inference is embarrassingly parallel over images:
        # round-robin device placement, one compiled program reused on
        # every chip, zero collectives (the DP analog of the reference's
        # DataParallel inference, infer/base.py:69)
        all_devices = jax.devices()
        self.devices = all_devices[: max(1, min(n_devices, len(all_devices)))]
        self._rr = 0

    # ------------------------------------------------------------ core

    def _pipeline_for(self, grid):
        """One compiled program per CANONICAL grid class (dynamic source
        size), so a directory of heterogeneous image sizes compiles O(1)
        programs instead of one per distinct size."""
        if grid not in self._pipelines:
            from .steps import make_tile_pipeline

            self._pipelines[grid] = make_tile_pipeline(
                self.model, grid, src_hw=None, batch=self.batch_size
            )
        return self._pipelines[grid]

    def predict_image_async(self, img: np.ndarray):
        """Dispatch one image's full pipeline (single jit call); returns
        device arrays (full_map, inst, tp) without blocking — at
        canonical (bucketed-grid) size, cropped to source by
        finalize_prediction. Successive calls rotate over the available
        devices."""
        src_h, src_w = img.shape[:2]
        win, step = self.patch_input_shape, self.patch_output_shape
        pads, coords, grid = prepare_tile_patching((src_h, src_w), win, step)
        padded = np.pad(img, ((pads[0], pads[1]), (pads[2], pads[3]), (0, 0)),
                        mode="reflect")
        rows, cols = bucket_grid_dim(grid[0]), bucket_grid_dim(grid[1])
        if (rows, cols) != grid:
            # zero-extend the canvas to the canonical grid; outputs there
            # are replaced by the in-executable reflect-101 mirror before
            # post-processing, and cropped away on finalize
            ext_h = rows * step + (win - step) - padded.shape[0]
            ext_w = cols * step + (win - step) - padded.shape[1]
            padded = np.pad(padded, ((0, ext_h), (0, ext_w), (0, 0)))
            ys = np.arange(0, rows * step, step, dtype=np.int32)
            xs = np.arange(0, cols * step, step, dtype=np.int32)
            yy, xx = np.meshgrid(ys, xs, indexing="ij")
            coords = np.stack([yy.ravel(), xx.ravel()], axis=-1)
        run = self._pipeline_for((rows, cols))
        device = self.devices[self._rr % len(self.devices)]
        self._rr += 1
        dev_img = jax.device_put(jnp.asarray(padded), device)
        dev_coords = jax.device_put(jnp.asarray(coords, jnp.int32), device)
        dev_src = jax.device_put(
            jnp.asarray([src_h, src_w], jnp.int32), device
        )
        variables = self._variables_on(device)
        out = run(variables, dev_img, dev_coords, dev_src)
        # queue device->host copies now: the transfers run as soon as
        # the computation finishes, overlapping the next tile's
        # dispatches instead of blocking inside finalize_prediction.
        # The production path pulls only the small per-instance tables
        # (stats + boundary COO), never the instance map.
        import os
        if not os.environ.get("HNT_NO_ASYNC_COPY"):
            _full, _inst, n_labels, _tp, tables = out
            for arr in (n_labels, tables["coo_n"], tables["stats"],
                        tables["coo"]):
                try:
                    arr.copy_to_host_async()
                except AttributeError:  # non-jax.Array backends
                    break
        return out

    def _variables_on(self, device):
        if len(self.devices) == 1:
            return self.variables
        cache = getattr(self, "_var_cache", None)
        if cache is None:
            cache = self._var_cache = {}
        if device not in cache:
            cache[device] = jax.device_put(self.variables, device)
        return cache[device]

    def _pp_refine_fn(self):
        """Exact-scan re-solve program for the seam-guard fallback
        (compiled lazily — only a contract-violating tile ever pays)."""
        if getattr(self, "_pp_refine", None) is None:
            from .steps import make_pp_refine

            self._pp_refine = make_pp_refine(self.model)
        return self._pp_refine

    def _seam_refine(self, img, full, n_sus, pull_pred_map, pull_inst_map):
        from ..ops.post_proc_device import active_blocked_geom

        logger.warning(
            "seam guard: %d instance(s) exceed the blocked post-proc "
            "kernel's %s halo bound — re-solving the tile with the "
            "exact scan path", n_sus, active_blocked_geom(
                *(int(v) for v in full.shape[:2])),
        )
        src_h, src_w = img.shape[:2]
        refined = self._pp_refine_fn()(
            full, jnp.asarray([src_h, src_w], jnp.int32))
        return self.finalize_prediction(
            img, refined, pull_pred_map, pull_inst_map, _seam_checked=True)

    def finalize_prediction(self, img, dev_out, pull_pred_map: bool = True,
                            pull_inst_map: bool = True,
                            _seam_checked: bool = False):
        """Extract instance info from the device tables, optionally pull
        the maps.

        The per-nucleus info (bbox/centroid/contour/type — the full
        json contract) is assembled from the DEVICE-computed tables:
        per-instance stats + the boundary-pixel COO walked by the
        native Suzuki-Abe tracer. The instance map itself only crosses
        the link when a caller needs the dense map (mat export /
        oracle comparisons): `pull_inst_map=False` skips that transfer
        and returns the uint16 device array in its place.
        pull_pred_map=False likewise skips the (12MB/tile) float32
        prediction-map transfer and returns the device slice.

        Instances violating the blocked kernel's halo bound
        (ops/post_proc_device.seam_suspects) trigger one exact-path
        re-solve of the whole tile; `_seam_checked` marks that second
        pass (no re-check — the exact path has no seams).
        """
        from ..ops.post_proc_device import seam_suspects

        src_h, src_w = img.shape[:2]
        full, inst_dev, n_labels, tp_dev, tables = dev_out
        pp_hw = tuple(int(v) for v in inst_dev.shape[:2])
        n = int(np.max(np.asarray(n_labels)))
        if n > 65535:
            logger.warning(
                "uint16 label compaction overflow: %d instances in one "
                "tile (> 65535) — ids were aliased", n,
            )

        inst_info = lut = None
        if n <= 65535:
            # exactly two array pulls (async-queued at dispatch); all
            # slicing happens host-side — a per-tile device slice would
            # cost a round trip (and a compile per distinct length)
            stats = np.asarray(tables["stats"])
            if not _seam_checked and n:
                sus = seam_suspects(stats[1 : n + 1, 0:4], *pp_hw)
                if sus.any():
                    return self._seam_refine(img, full, int(sus.sum()),
                                             pull_pred_map, pull_inst_map)
            host_tables = {
                "coo_n": np.asarray(tables["coo_n"]),
                "coo": np.asarray(tables["coo"]),
                "bbox": stats[:, 0:4],
            }
            if stats.shape[1] > 4:  # typed path packs sums + hist too
                host_tables["sum_yx"] = stats[:, 4:6]
                host_tables["size"] = stats[:, 6]
            if stats.shape[1] > 7:
                host_tables["type_hist"] = stats[:, 7:]
            inst_info, lut = instance_info_from_tables(
                host_tables, n, typed=self.nr_types is not None
            )

        if inst_info is None:
            # capacity overflow (degenerate content): dense-map path
            inst_map = remap_label(
                np.asarray(inst_dev)[:src_h, :src_w].astype(np.int32)
            )
            pred_type = (np.asarray(tp_dev)[:src_h, :src_w].astype(np.int32)
                         if self.nr_types else None)
            inst_map, inst_info = extract_instance_info(inst_map, pred_type)
            inst_map = inst_map.astype(np.int32)
            if not _seam_checked and inst_info:
                bb = np.array([[v["bbox"][0][0], v["bbox"][1][0],
                                v["bbox"][0][1], v["bbox"][1][1]]
                               for v in inst_info.values()])
                sus = seam_suspects(bb, *pp_hw)
                if sus.any():
                    return self._seam_refine(img, full, int(sus.sum()),
                                             pull_pred_map, pull_inst_map)
        elif pull_inst_map:
            inst_map = np.asarray(inst_dev)[:src_h, :src_w].astype(np.int32)
            if lut is not None:  # erase artifact ids (keeps map==dict)
                from ..ops.instance_table import apply_lut

                inst_map = apply_lut(inst_map, lut)
        else:
            inst_map = inst_dev  # device uint16 (caller pulls if needed)

        pred_map = full[:src_h, :src_w]
        if pull_pred_map:
            pred_map = np.asarray(pred_map).astype(np.float32)
        return pred_map, inst_map, inst_info

    def predict_image(self, img: np.ndarray):
        """RGB uint8 image -> (pred_map [H,W,C] cropped to src,
        inst_map int32, inst_info dict)."""
        if self.device_post_proc:
            return self.finalize_prediction(img, self.predict_image_async(img))
        # host post-proc fallback / oracle path
        src_h, src_w = img.shape[:2]
        win, step = self.patch_input_shape, self.patch_output_shape
        pads, coords, grid = prepare_tile_patching((src_h, src_w), win, step)
        padded = np.pad(img, ((pads[0], pads[1]), (pads[2], pads[3]), (0, 0)),
                        mode="reflect")
        patches = extract_patches(jnp.asarray(padded),
                                  jnp.asarray(coords, jnp.int32), win)
        out = self.run_batches(patches)
        full = assemble_grid(out, grid)
        pred_map = np.asarray(full[:src_h, :src_w]).astype(np.float32)
        inst_map, inst_info = host_process(
            pred_map, nr_types=self.nr_types, return_centroids=True
        )
        return pred_map, inst_map.astype(np.int32), inst_info

    # --------------------------------------------------------- outputs

    def _save_outputs(self, name, img, pred_map, inst_map, inst_info,
                      output_dir, draw_dot=False, save_qupath=False,
                      save_raw_map=False, save_format="all"):
        nuc_vals = list(inst_info.values())
        if save_format == "all":
            mat = {
                "inst_map": inst_map,
                "inst_uid": np.array(list(inst_info.keys()))[:, None],
                "inst_centroid": np.array([v["centroid"] for v in nuc_vals])
                if nuc_vals else np.zeros((0, 2)),
            }
            if self.nr_types is not None:
                mat["inst_type"] = (
                    np.array([v["type"] for v in nuc_vals])[:, None]
                    if nuc_vals else np.zeros((0, 1), np.int32))
            if save_raw_map:
                mat["raw_map"] = pred_map
            sio.savemat(f"{output_dir}/mat/{name}.mat", mat)

            overlaid = overlay_instances(
                img, inst_info, draw_dot=draw_dot,
                type_colour=self.type_info, line_thickness=2,
            )
            cv2.imwrite(f"{output_dir}/overlay/{name}.png",
                        cv2.cvtColor(overlaid, cv2.COLOR_RGB2BGR))

        if save_qupath:
            # header-only tsv for 0 nuclei, like the reference's
            # unconditional export (infer/tile.py:198-205)
            to_qupath(
                f"{output_dir}/qupath/{name}.tsv",
                np.array([v["centroid"] for v in nuc_vals]).reshape(-1, 2),
                np.array([v["type"] for v in nuc_vals], dtype=np.int64),
                self.type_info,
            )
        base.save_json(f"{output_dir}/json/{name}.json", inst_info, None)

    # ------------------------------------------------------------- run

    def process_file_list(self, input_dir, output_dir, draw_dot=False,
                          save_qupath=False, save_raw_map=False,
                          save_format="all"):
        """save_format: "all" writes the full reference contract
        (mat/overlay/json[/qupath], infer/tile.py:170-212). "json"
        writes json[/qupath] only — the per-nucleus dict is assembled
        purely from the device tables, so the dense instance map never
        crosses the link (the documented high-throughput config; this
        is what bench.py's e2e metric times)."""
        pattern = re.sub(r"([\[\]])", "[\\1]", f"{input_dir}/*")
        files = sorted(glob.glob(pattern))
        assert files, f"no input files found in {input_dir}"

        if save_format == "json" and save_raw_map:
            logger.warning("--save_raw_map is a mat-file field; ignored "
                           "with --save_format json")
            save_raw_map = False
        subs = (("json", "mat", "overlay") if save_format == "all"
                else ("json",))
        for sub in subs + (("qupath",) if save_qupath else ()):
            _rm_n_mkdir(f"{output_dir}/{sub}")

        # software pipeline: dispatch image k+1's device work before
        # finalizing image k (hides dispatch + transfer latency). The
        # finalize+save host work runs on ONE worker thread so the main
        # thread keeps dispatching while the host extracts — the native
        # stats/contour passes release the GIL and the dispatch RPCs
        # are IO-bound, so the two genuinely overlap even on one core
        # (device idle gap measured ~30 ms/tile with inline finalize).
        n_failed = 0  # only touched by the main + single worker thread

        def _finalize_one(name, img, dev_out, t0):
            nonlocal n_failed
            try:
                pred_map, inst_map, inst_info = self.finalize_prediction(
                    img, dev_out, pull_pred_map=save_raw_map,
                    pull_inst_map=(save_format == "all"),
                )
                self._save_outputs(name, img, pred_map, inst_map,
                                   inst_info, output_dir, draw_dot,
                                   save_qupath, save_raw_map,
                                   save_format)
                logger.info("done %s (%d nuclei, %.2fs)", name,
                            len(inst_info), time.perf_counter() - t0)
            except Exception:
                n_failed += 1
                logger.exception("crash on %s", name)

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        depth = 3 * len(self.devices)
        with ThreadPoolExecutor(max_workers=1) as fin:
            futs = deque()  # single worker => finalizes stay ordered
            for path in files + [None]:
                if path is not None:
                    name = pathlib.Path(path).stem
                    t0 = time.perf_counter()
                    try:
                        img = cv2.cvtColor(cv2.imread(path),
                                           cv2.COLOR_BGR2RGB)
                        if self.device_post_proc:
                            futs.append(fin.submit(
                                _finalize_one, name, img,
                                self.predict_image_async(img), t0))
                        else:
                            pred_map, inst_map, inst_info = \
                                self.predict_image(img)
                            self._save_outputs(name, img, pred_map,
                                               inst_map, inst_info,
                                               output_dir, draw_dot,
                                               save_qupath, save_raw_map,
                                               save_format)
                            logger.info("done %s (%d nuclei, %.2fs)",
                                        name, len(inst_info),
                                        time.perf_counter() - t0)
                            continue
                    except Exception:
                        n_failed += 1
                        logger.exception("crash on %s", name)
                        continue
                while futs and (path is None or len(futs) >= depth):
                    futs.popleft().result()
        # per-image crashes are logged and skipped (reference policy),
        # but a systematic failure (unwritable output dir, full disk,
        # every image crashing) must not exit 0 with empty outputs
        # (ADVICE r4)
        if n_failed:
            logger.error("%d/%d images failed", n_failed, len(files))
            if n_failed == len(files):
                raise RuntimeError(
                    f"all {len(files)} images failed post-processing/"
                    "saving — see tracebacks above")
        return len(files) - n_failed
