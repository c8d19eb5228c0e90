"""Extract the bare params subtree from a full TrainState checkpoint.

The run dirs under ``checkpoints/`` are gitignored (optimizer state doubles
the size and changes every epoch), but `results/rd_points_*.json` cites
specific checkpoints — this tool snapshots the params of a cited checkpoint
into ``results/ckpts/`` so the committed artifacts stay reproducible
after the run dirs are gone.

Usage: python tools/export_params.py <in.ckpt> <out.msgpack>
"""

import os
import sys

from flax import serialization


def main(src: str, dst: str):
    with open(src, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = raw.get("params", raw) if isinstance(raw, dict) else raw
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    with open(dst, "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    print(dst, os.path.getsize(dst), "bytes")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
