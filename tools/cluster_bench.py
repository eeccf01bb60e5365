"""Greedy-cluster throughput at the BASELINE "1M pre-aligned sequences"
config (BASELINE.json configs[3]).

Generates a SingleM-shaped workload — N 60 bp windows mutated off a pool
of ancestors so the centroid count stays realistic (clusters exist) —
then times `smafa_tpu.engine.cluster.cluster` end to end (parse, dedup,
device scans, host resolution, TSV emit) and prints one JSON line.

    python tools/cluster_bench.py [--n 1000000] [--ancestors 4000]
                                  [--divergence 5] [--out /tmp/out.tsv]

Reference semantics: cluster.rs:13-94 (serial, single thread).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))


def make_input(path: pathlib.Path, n: int, ancestors: int, seq_len: int,
               mut_max: int, seed: int) -> None:
    rng = np.random.default_rng(seed)
    anc = rng.integers(0, 4, size=(ancestors, seq_len), dtype=np.int8)
    bases = np.frombuffer(b"ACGT", np.uint8)
    chunk = 65536
    with open(path, "wb") as f:
        written = 0
        while written < n:
            k = min(chunk, n - written)
            rows = anc[rng.integers(0, ancestors, k)]
            # sprinkle 0..mut_max point mutations per row
            nmut = rng.integers(0, mut_max + 1, k)
            total = int(nmut.sum())
            if total:
                ridx = np.repeat(np.arange(k), nmut)
                cidx = rng.integers(0, seq_len, total)
                rows = rows.copy()
                rows[ridx, cidx] = rng.integers(0, 4, total)
            blob = bases[rows]
            lines = []
            for j in range(k):
                lines.append(b">s%d\n" % (written + j))
                lines.append(blob[j].tobytes())
                lines.append(b"\n")
            f.write(b"".join(lines))
            written += k


def main() -> None:
    from smafa_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--ancestors", type=int, default=4000)
    ap.add_argument("--seq-len", type=int, default=60)
    ap.add_argument("--mut-max", type=int, default=4)
    ap.add_argument("--divergence", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from smafa_tpu.engine.cluster import cluster

    with tempfile.TemporaryDirectory() as td:
        inp = pathlib.Path(td) / "in.fna"
        t = time.time()
        make_input(inp, args.n, args.ancestors, args.seq_len,
                   args.mut_max, args.seed)
        gen_s = time.time() - t

        outp = pathlib.Path(args.out) if args.out else pathlib.Path(td) / "out.tsv"
        t = time.time()
        with open(outp, "w") as out:
            cluster(inp, args.divergence, out=out, batch_size=args.batch_size)
        wall = time.time() - t
        n_lines = sum(1 for _ in open(outp))
        n_centroids = len({l.split("\t", 1)[1] for l in open(outp)})

    print(json.dumps({
        "metric": "cluster_seqs_per_sec",
        "value": round(args.n / wall, 1),
        "unit": "seqs/sec",
        "n": args.n,
        "wall_s": round(wall, 1),
        "gen_s": round(gen_s, 1),
        "lines": n_lines,
        "centroids": n_centroids,
        "divergence": args.divergence,
    }))


if __name__ == "__main__":
    main()
