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


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
