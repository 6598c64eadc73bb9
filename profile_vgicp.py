"""Stage-level profiling of the VGICP bench workload (NOT shipped)."""
import time
import jax
import jax.numpy as jnp

from mr_slam_tpu.geometry import se3
from mr_slam_tpu.ops import pointcloud as pcl, registration, voxel_grid

BATCH, POINTS, ITERS = 32, 4096, 50

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, BATCH + 2)
xyz = jax.random.uniform(key, (BATCH, POINTS, 3), minval=-25.0, maxval=25.0)
targets = pcl.PointCloud(xyz, jnp.ones((BATCH, POINTS), bool))
build = jax.jit(jax.vmap(lambda c: voxel_grid.build(c, 0.5, 1 << 14, min_points=1)))
grids = build(targets)
grids.mean.block_until_ready()
sources = targets
init = se3.identity((BATCH,))


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.3f} ms")
    return dt


# 1. full vgicp 50 iters
run = jax.jit(jax.vmap(lambda s, g, i: registration.vgicp(s, g, i, iters=ITERS).pose.t))
t_full = timeit("full vgicp 50 iters", run, sources, grids, init)
print(f"  -> per-iter {t_full/ITERS*1e3:.3f} ms, {BATCH/t_full:.1f} reg/s")

# 2. lookup only, 50x
@jax.jit
def lookups(s, g):
    def body(c, _):
        found, cnt, mu, Cv = jax.vmap(lambda ss, gg: voxel_grid.lookup(gg, ss.xyz, "direct1"))(s, g)
        return c + jnp.sum(mu), None
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
    return c

t_lk = timeit("lookup x50 (direct1)", lookups, sources, grids)

# 2b. one direct27 lookup
@jax.jit
def lookup27(s, g):
    found, cnt, mu, Cv = jax.vmap(lambda ss, gg: voxel_grid.lookup(gg, ss.xyz, "direct27"))(s, g)
    return jnp.sum(mu)
timeit("lookup x1 (direct27)", lookup27, sources, grids)

# 3. GN math only (fake gathered data), 50x
@jax.jit
def gn_math(s, g):
    mu = s.xyz + 0.1
    Cv = jnp.broadcast_to(jnp.eye(3) * 0.01, (BATCH, POINTS, 3, 3))
    w = jnp.ones((BATCH, POINTS))
    from mr_slam_tpu.ops import linalg3

    def one(pose_t, _):
        tp = s.xyz + pose_t[:, None, :]
        W = linalg3.inv3(Cv + 1e-6 * jnp.eye(3))
        r = mu - tp
        hat_tp = jnp.stack(
            [
                jnp.stack([jnp.zeros_like(tp[..., 0]), -tp[..., 2], tp[..., 1]], -1),
                jnp.stack([tp[..., 2], jnp.zeros_like(tp[..., 0]), -tp[..., 0]], -1),
                jnp.stack([-tp[..., 1], tp[..., 0], jnp.zeros_like(tp[..., 0])], -1),
            ],
            axis=-2,
        )
        J = jnp.concatenate([-jnp.broadcast_to(jnp.eye(3), hat_tp.shape), hat_tp], axis=-1)
        WJ = jnp.einsum("bnij,bnjk->bnik", W, J)
        H = jnp.einsum("bnij,bnik,bn->bjk", J, WJ, w)
        b = -jnp.einsum("bnij,bni,bn->bj", WJ, r, w)
        dx = jnp.linalg.solve(H + 1e-4 * jnp.eye(6), b[..., None])[..., 0]
        return pose_t + 0.0 * dx[:, :3], None

    out, _ = jax.lax.scan(one, jnp.zeros((BATCH, 3)), None, length=ITERS)
    return out

timeit("GN math x50 (no gather)", gn_math, sources, grids)
