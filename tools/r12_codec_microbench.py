"""r12 — pure-Python microbench of the JPEG codec vectorization
(VERDICT r11 item 7): times encode_avi_mjpeg + decode_avi_frames over
video-gate-style payloads, old tree vs worktree, in ONE process so the
comparison is host-window-free.  Pass a git ref to load the OLD module
from `git show`; default compares only the current tree (timing row).

Usage: python tools/r12_codec_microbench.py [old_ref] [n_docs]
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOD_PATH = "transcriptomics_data_integration_spark/llmdata/multimodal.py"


def load_module(name: str, src_path: str):
    spec = importlib.util.spec_from_file_location(name, src_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def gate_frames(did: int, NF=8, BH=2, BW=17):
    bi = np.arange(BH).reshape(-1, 1)
    bj = np.arange(BW).reshape(1, -1)
    ones = np.ones((8, 8), dtype=np.uint8)
    m = (did // 2) % 997 + 3
    frames = []
    for f in range(NF):
        v = (m * (f * 53 + bi * 37 + bj * 17 + 1) + (m * m % 251) * f * bj) % 256
        if did % 2 == 1 and f == 3:
            v = v.copy()
            v[0, 9] = (v[0, 9] + 128) % 256
        frames.append(np.kron(v.astype(np.uint8), ones))
    return frames


def bench(mod, label: str, n_docs: int):
    # encode pass
    t0 = time.perf_counter()
    payloads = [
        mod.encode_avi_mjpeg(gate_frames(did), fps=12) for did in range(n_docs)
    ]
    t_enc = time.perf_counter() - t0
    # decode pass
    t0 = time.perf_counter()
    outs = [mod.decode_avi_frames(p) for p in payloads]
    t_dec = time.perf_counter() - t0
    ok = all(o is not None and len(o["frames"]) == 8 for o in outs)
    print(
        f"{label}: encode={t_enc:.3f}s decode={t_dec:.3f}s "
        f"total={t_enc + t_dec:.3f}s ok={ok} n={n_docs}"
    )
    return payloads, outs


def main() -> None:
    old_ref = sys.argv[1] if len(sys.argv) > 1 else None
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    new_mod = load_module("mm_new", MOD_PATH)
    if old_ref:
        src = subprocess.run(
            ["git", "show", f"{old_ref}:{MOD_PATH}"],
            capture_output=True, text=True, check=True,
        ).stdout
        tmp = "/tmp/mm_old_r12.py"
        with open(tmp, "w") as f:
            f.write(src)
        old_mod = load_module("mm_old", tmp)
        # interleave A/B/A/B to cancel thermal/cache drift
        for rep in range(3):
            po, oo = bench(old_mod, f"old[{rep}]", n_docs)
            pn, on = bench(new_mod, f"new[{rep}]", n_docs)
        # bit-equality of payload bytes and decoded pixels
        assert all(a == b for a, b in zip(po, pn)), "payload bytes differ!"
        for a, b in zip(oo, on):
            assert len(a["frames"]) == len(b["frames"])
            for fa, fb in zip(a["frames"], b["frames"]):
                assert np.array_equal(fa, fb), "decoded pixels differ!"
        print("bit-equality: payload bytes and decoded pixels identical")
    else:
        for rep in range(3):
            bench(new_mod, f"new[{rep}]", n_docs)


if __name__ == "__main__":
    main()
