import time, numpy as np, jax, jax.numpy as jnp

x = jnp.arange(4 * 16384, dtype=jnp.int32).reshape(4, 16384)
outs = [x[i] * 2 for i in range(4)]
outs = [o.block_until_ready() for o in outs]
stacked = (x * 2).block_until_ready()

for name, fn in [
    ("4x np.asarray", lambda: [np.asarray(o) for o in outs]),
    ("device_get tuple", lambda: jax.device_get(tuple(outs))),
    ("1x stacked", lambda: np.asarray(stacked)),
]:
    fn()
    best = min(
        (lambda t0=time.perf_counter(): (fn(), time.perf_counter() - t0)[1])()
        for _ in range(5)
    )
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
