import logging, sys, time, pathlib, tempfile
sys.path.insert(0, "tools")
import numpy as np
from cluster_bench import make_input

logging.basicConfig(level=logging.DEBUG, stream=sys.stderr, format="%(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)
p = pathlib.Path(tempfile.mkdtemp()) / "in.fna"
make_input(p, 1_000_000, 4000, 60, 4, 0)   # the standard BASELINE config
from smafa_tpu.engine.cluster import cluster
out = open(tempfile.mktemp(), "w")
t0 = time.time()
cluster(p, 5, out=out)
print(f"TOTAL {time.time()-t0:.1f}s", file=sys.stderr)
