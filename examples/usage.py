"""Inspecting hover_net_tpu outputs (the reference's usage notebook as a
script): the json nuc dict, the .mat instance map, overlays, and
pseudo-slide region reads.

Run tile inference first (scripts/run_tile.sh), then:
    python examples/usage.py out/ <image_name>
"""

import json
import sys

import numpy as np
import scipy.io as sio


def main(output_dir: str, name: str):
    # --- json: per-nucleus records
    with open(f"{output_dir}/json/{name}.json") as f:
        payload = json.load(f)
    print(f"magnification tag: {payload['mag']}")
    nuc = payload["nuc"]
    print(f"nuclei: {len(nuc)}")
    for inst_id, info in list(nuc.items())[:3]:
        print(f"  id={inst_id} type={info['type']} "
              f"type_prob={info['type_prob']} centroid={info['centroid']} "
              f"bbox={info['bbox']} contour_pts={len(info['contour'])}")

    # --- mat: dense instance map + aligned per-instance arrays
    mat = sio.loadmat(f"{output_dir}/mat/{name}.mat")
    inst_map = mat["inst_map"]
    print(f"inst_map: {inst_map.shape} {inst_map.dtype}, "
          f"{len(np.unique(inst_map)) - 1} instances")
    print(f"inst_uid/inst_type/inst_centroid shapes: "
          f"{mat['inst_uid'].shape} "
          f"{mat.get('inst_type', np.zeros((0, 1))).shape} "
          f"{mat['inst_centroid'].shape}")

    # --- overlay png is at {output_dir}/overlay/{name}.png
    print(f"overlay: {output_dir}/overlay/{name}.png")


def wsi_example(wsi_out_dir: str, name: str, wsi_path: str = None):
    """WSI outputs (scripts/run_wsi.sh): one json per slide, nuclei in
    slide coordinates at the processing magnification, plus region reads
    through the same handler the pipeline uses (the reference notebook's
    WSI section)."""
    with open(f"{wsi_out_dir}/{name}.json") as f:
        payload = json.load(f)
    print(f"processed at {payload['mag']}x, {len(payload['nuc'])} nuclei")
    # nuclei within a region of interest, e.g. a 1000^2 box at (2000, 3000)
    y0, x0, size = 2000, 3000, 1000
    in_roi = [
        (k, v) for k, v in payload["nuc"].items()
        if y0 <= v["centroid"][1] < y0 + size
        and x0 <= v["centroid"][0] < x0 + size
    ]
    print(f"nuclei in ROI ({y0},{x0})+{size}: {len(in_roi)}")

    if wsi_path is not None:
        # region read at the processing magnification — OpenSlide for
        # .svs/.tif/..., pseudo-slide .npy arrays for tests
        from hover_net_tpu.infer.wsi_handler import get_file_handler

        handler = get_file_handler(wsi_path)
        handler.prepare_reading(read_mag=payload["mag"],
                                cache_path="cache/src_wsi.npy")
        region = handler.read_region((x0, y0), (size, size))
        print(f"region: {region.shape} {region.dtype}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "wsi":
        wsi_example(*sys.argv[2:])
    else:
        main(sys.argv[1], sys.argv[2])
