"""Full-CLI K-mode e2e (parse + kstats + compactd + EMIT) at K=99."""
import os, subprocess, sys, time
import numpy as np

root = "/root/repo"
work = os.path.join(root, "_kcli_work")
os.makedirs(work, exist_ok=True)
L, W, B = 60, 1 << 20, 65536
rng = np.random.default_rng(0)
from smafa_tpu.core.windowset import WindowSet
from smafa_tpu.io import native_format
codes = rng.integers(0, 5, (W, L), dtype=np.uint8)
db_path = os.path.join(work, "db1m.smafatpu")
native_format.save(WindowSet.from_matrix(codes, 2), db_path)
q = rng.integers(0, 5, (B, L), dtype=np.uint8)
alpha = np.array(list("ACGTN"))
q_path = os.path.join(work, "q.fna")
with open(q_path, "w") as f:
    for i, row in enumerate(q):
        f.write(f">q{i}\n{''.join(alpha[row])}\n")
out_path = os.path.join(work, "hits.tsv")
env = dict(os.environ)
for warm in (True, False):
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-m", "smafa_tpu", "query", "-d", db_path,
         "-q", q_path, "--max-num-hits", "99", "-o", out_path,
         "--batch-size", "16384"],
        env=env, capture_output=True, text=True, timeout=3000, cwd=root,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    wall = time.time() - t0
    nlines = sum(1 for _ in open(out_path))
    print(f"{'cold' if warm else 'warm'}: {wall:.1f}s, {nlines} hit lines, "
          f"{nlines/wall/1e6:.2f}M lines/s e2e", flush=True)
import shutil
shutil.rmtree(work)
