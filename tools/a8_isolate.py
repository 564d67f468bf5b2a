import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from exllamav3_tpu.ops.q_matmul import int4_matmul_pallas_a8, int4_pack_jnp

rng = np.random.default_rng(0)
k = n = 4096
w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
packed, scales = int4_pack_jnp(jnp.asarray(w))
packed.block_until_ready()
roof = (packed.size + 2 * scales.size) / 819e9

@functools.partial(jax.jit, static_argnames=("reps", "mode"))
def loop(xq, reps, mode):
    def body(c, _):
        y = int4_matmul_pallas_a8(c, packed, scales, m_true=16)
        if mode == "xor":
            nxt = c ^ (jnp.max(y) * 0).astype(jnp.int8)
        else:
            nxt = c
        return nxt, y[0, 0]
    out, ys = jax.lax.scan(body, xq, None, length=reps)
    return ys

serial = [0]
def time_one(m_data, reps=500):
    def run(r):
        best = float("inf")
        for _ in range(3):
            serial[0] += 1
            x = np.zeros((32, k), np.int8)
            x[:m_data] = rng.integers(-127, 128, (m_data, k))
            xq = jnp.asarray(x ^ (serial[0] & 63))
            t0 = time.time()
            np.asarray(loop(xq, r, "xor")[-8:])
            best = min(best, time.time() - t0)
        return best
    run(reps); run(4 * reps)
    return max(run(4 * reps) - run(reps), 1e-9) / (3 * reps)

for m_data in (1, 16, 32):
    dt = time_one(m_data)
    print(f"pure kernel, {m_data} live rows: {dt*1e6:6.1f} us ({100*roof/dt:5.1f}% roof)", flush=True)
