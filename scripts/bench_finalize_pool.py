"""Bound the WSI host-finalize pool's benefit empirically (VERDICT r4
item 7). This host has ONE core, so the pool's projected ~4x at-scale
win cannot be observed as wall-clock here; what CAN be measured:

  (a) per-window extraction cost (remap + native stats/contour passes)
      — the unit the at-scale host-stage projection multiplies;
  (b) pool overhead: ext_pool.map with 1 worker vs plain sequential
      (must be ~1.0x — the pool costs nothing when it cannot help);
  (c) GIL release: a pure-Python spin thread's progress rate while a
      native extraction loop runs concurrently. ctypes CDLL calls drop
      the GIL, so on one core the OS timeshares (~0.5x of the spin
      thread's solo rate); a GIL-holding pass would starve it to ~0.
      This is the property the 4x projection rides on: with the GIL
      released, N cores really do run N extractions concurrently.

    python scripts/bench_finalize_pool.py [--windows 16] [--size 512]
"""

import argparse
import json
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hover_net_tpu.metrics import remap_label  # noqa: E402
from hover_net_tpu.ops.post_proc_host import extract_instance_info  # noqa: E402


def paint_windows(n_win, size, per_win, seed=11):
    rng = np.random.default_rng(seed)
    wins = []
    yy, xx = np.mgrid[-12:13, -12:13]
    for _ in range(n_win):
        inst = np.zeros((size, size), np.int32)
        k = 1
        for _ in range(per_win):
            cy = int(rng.integers(14, size - 14))
            cx = int(rng.integers(14, size - 14))
            r = int(rng.integers(5, 11))
            m = (yy ** 2 + xx ** 2) <= r * r
            sub = inst[cy - 12:cy + 13, cx - 12:cx + 13]
            sub[m & (sub == 0)] = k
            k += 1
        wins.append(inst)
    return wins


def extract_all(wins, pool=None):
    def one(w):
        return extract_instance_info(remap_label(w))

    t0 = time.perf_counter()
    if pool is None:
        out = [one(w) for w in wins]
    else:
        out = list(pool.map(one, wins))
    dt = time.perf_counter() - t0
    n = sum(len(info) for _, info in out)
    return dt, n


def spin_rate(stop_evt, out):
    c = 0
    t0 = time.perf_counter()
    while not stop_evt.is_set():
        c += 1
    out.append(c / (time.perf_counter() - t0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--per_win", type=int, default=150)
    args = ap.parse_args()

    wins = paint_windows(args.windows, args.size, args.per_win)
    # warm the native build
    extract_all(wins[:1])

    t_seq, n_inst = extract_all(wins)
    t_seq = min(t_seq, extract_all(wins)[0])
    with ThreadPoolExecutor(max_workers=1) as p1:
        t_p1, _ = extract_all(wins, p1)
        t_p1 = min(t_p1, extract_all(wins, p1)[0])
    with ThreadPoolExecutor(max_workers=2) as p2:
        t_p2, _ = extract_all(wins, p2)
        t_p2 = min(t_p2, extract_all(wins, p2)[0])

    # GIL probe: spin thread solo vs spin thread beside a native loop
    def measure_spin(concurrent_native: bool, dur=2.0):
        stop = threading.Event()
        rates = []
        th = threading.Thread(target=spin_rate, args=(stop, rates))
        th.start()
        t0 = time.perf_counter()
        if concurrent_native:
            while time.perf_counter() - t0 < dur:
                extract_all(wins[:2])
        else:
            time.sleep(dur)
        stop.set()
        th.join()
        return rates[0]

    solo = measure_spin(False)
    beside = measure_spin(True)

    print(json.dumps({
        "n_windows": args.windows, "window": args.size,
        "instances": n_inst,
        "ms_per_window_seq": round(t_seq / args.windows * 1000, 2),
        "pool1_overhead_x": round(t_p1 / t_seq, 3),
        "pool2_vs_seq_x": round(t_p2 / t_seq, 3),
        "spin_rate_share_beside_native": round(beside / solo, 3),
        "gil_released": bool(beside / solo > 0.25),
        "host_cores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
