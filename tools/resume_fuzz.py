"""Resume-equivalence property campaign: interrupt anywhere, resume,
byte-identical.

For random workloads, runs `query --resume-state` / `cluster
--resume-state` with an output wrapper that dies at a random write (torn
mid-line half the time), resumes — possibly crashing several more times
— and asserts the final bytes equal one straight run. Exercises the
checkpoint JSON, the torn batch-0 baseline, the centroid sidecar, and
the dedup-prefix rebuild. CPU 8-device mesh.

    python tools/resume_fuzz.py [start_seed] [count]
"""

import io
import json
import os
import pathlib
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

import numpy as np

from smafa_tpu.engine.cluster import cluster
from smafa_tpu.engine.query import query
from smafa_tpu.engine.makedb import makedb
from smafa_tpu.parallel import slab as slab_mod
from smafa_tpu.utils.testing import CrashError, CrashyFile

_orig_slab_init = slab_mod.SlabStreamRunner.__init__


def write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")


def gen_seqs(rng, n, L, anc_n):
    anc = rng.integers(0, 4, size=(anc_n, L))
    rows = anc[rng.integers(0, anc_n, n)]
    nmut = rng.integers(0, max(1, L // 6), n)
    for j in range(n):
        for _ in range(int(nmut[j])):
            rows[j, int(rng.integers(0, L))] = int(rng.integers(0, 4))
    return ["".join("ACGT"[c] for c in row) for row in rows]


def run_to_completion(op, rng, outp, state):
    """Run op(out) under repeated random crashes until it completes."""
    for _attempt in range(30):
        fail_at = int(rng.integers(1, 12))
        torn = bool(rng.integers(0, 2))
        try:
            with open(outp, "a+") as f:
                op(CrashyFile(f, fail_at, torn))
            return
        except CrashError:
            continue
    raise AssertionError("op did not complete within 30 crash-resume cycles")


START = int(sys.argv[1]) if len(sys.argv) > 1 else 500000
COUNT = int(sys.argv[2]) if len(sys.argv) > 2 else 60

fails = 0
for n in range(START, START + COUNT):
    rng = np.random.default_rng(n)
    L = int(rng.integers(6, 50))
    bs = int(rng.integers(3, 40))
    kind = n % 2
    # Crash-anywhere resume must hold under every db layout, including
    # multi-slab out-of-core streaming.
    layout = ["auto", "sharded", "ring", "col", "stream"][n % 5]
    os.environ["SMAFA_TPU_LAYOUT"] = layout
    # Round 5: the resume skip must land on the same records when the
    # chunked native ingest splits the stream at arbitrary window sizes.
    _chunk = ["", "89", "257"][(n // 3) % 3]
    if _chunk:
        os.environ["SMAFA_TPU_INGEST_CHUNK"] = _chunk
    else:
        os.environ.pop("SMAFA_TPU_INGEST_CHUNK", None)
    if layout == "stream":
        ch = 16
        sr = ch * int(rng.integers(1, 5))
        slab_mod.SlabStreamRunner.__init__ = (
            lambda self, codes, seq_len, slab_rows=None, chunk=None,
            _sr=sr, _ch=ch:
                _orig_slab_init(self, codes, seq_len, slab_rows=_sr, chunk=_ch)
        )
    else:
        slab_mod.SlabStreamRunner.__init__ = _orig_slab_init
    try:
        with tempfile.TemporaryDirectory() as td:
            tdp = pathlib.Path(td)
            outp = tdp / "out.tsv"
            state = tdp / "st.json"
            if kind == 0:  # query
                db = gen_seqs(rng, int(rng.integers(5, 120)), L, 6)
                qs = gen_seqs(rng, int(rng.integers(10, 90)), L, 6)
                write_fasta(tdp / "s.fna", db)
                write_fasta(tdp / "q.fna", qs)
                makedb(tdp / "s.fna", tdp / "d.db")
                kw = {}
                if rng.integers(0, 2):
                    kw["max_num_hits"] = int(rng.integers(2, 30))
                full = io.StringIO()
                query(tdp / "d.db", tdp / "q.fna", out=full,
                      batch_size=bs, **kw)
                op = lambda f: query(tdp / "d.db", tdp / "q.fna", out=f,
                                     batch_size=bs, resume_state=state, **kw)
            else:  # cluster
                seqs = gen_seqs(rng, int(rng.integers(20, 150)), L, 5)
                write_fasta(tdp / "in.fna", seqs)
                maxd = int(rng.integers(0, max(1, L // 2)))
                full = io.StringIO()
                cluster(tdp / "in.fna", maxd, out=full, batch_size=bs)
                op = lambda f: cluster(tdp / "in.fna", maxd, out=f,
                                       batch_size=bs, resume_state=state)
            run_to_completion(op, rng, outp, state)
            got = outp.read_text()
            assert got == full.getvalue(), "resume output mismatch"
            assert json.loads(state.read_text())["done"] > 0
    except Exception:
        import traceback

        fails += 1
        print(f"FAIL seed={n} kind={kind} L={L} bs={bs}", flush=True)
        traceback.print_exc()
        if fails >= 5:
            break
    if (n - START + 1) % 10 == 0:
        print(f"{n - START + 1}/{COUNT} done ({fails} fails)", flush=True)

print(f"RESUME CAMPAIGN DONE: {COUNT} configs, {fails} failures", flush=True)
