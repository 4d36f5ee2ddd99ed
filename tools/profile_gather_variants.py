"""Find the fast gather formulation for reprojection taps on TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ITERS = 4


def bench(name, jitted, *args):
    import jax

    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/ITERS*1e3:9.2f} ms/iter",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    H, W = 1080, 1920
    rs = np.random.RandomState(0)
    planes = [jnp.asarray(rs.normal(size=(H, W)), jnp.float32) for _ in range(11)]
    idx0 = jnp.asarray(rs.randint(0, H * W, size=(H, W)), jnp.int32)

    # variant 1: stacked-table row gather (current reproject shape)
    @jax.jit
    def stacked(ps, idx):
        table = jnp.stack(ps, axis=-1).reshape(H * W, 11)
        def body(_, carry):
            c, ii = carry
            v = jnp.take(table, ii, axis=0)  # (H,W,11)
            c = c + v.sum(-1)
            ii = (ii + (c > 1e30).astype(jnp.int32)) % (H * W)
            return (c, ii)
        c, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros((H, W)), idx))
        return c

    bench("row-gather stacked (H*W,11)", stacked, planes, idx0)

    # variant 2: per-channel 1-D gathers
    @jax.jit
    def per_channel(ps, idx):
        flats = [p.reshape(-1) for p in ps]
        def body(_, carry):
            c, ii = carry
            acc = jnp.zeros((H, W))
            for f in flats:
                acc = acc + jnp.take(f, ii)
            c = c + acc
            ii = (ii + (c > 1e30).astype(jnp.int32)) % (H * W)
            return (c, ii)
        c, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros((H, W)), idx))
        return c

    bench("11x per-channel 1-D gathers", per_channel, planes, idx0)

    # variant 3: per-channel with flat (H*W,) index
    idx_flat = idx0.reshape(-1)

    @jax.jit
    def per_channel_flat(ps, idx):
        flats = [p.reshape(-1) for p in ps]
        def body(_, carry):
            c, ii = carry
            acc = jnp.zeros((H * W,))
            for f in flats:
                acc = acc + jnp.take(f, ii)
            c = c + acc
            ii = (ii + (c > 1e30).astype(jnp.int32)) % (H * W)
            return (c, ii)
        c, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros((H * W,)), idx))
        return c

    bench("11x per-channel flat idx", per_channel_flat, planes, idx_flat)

    # variant 4: gather rows from (H*W, 16) row-major padded table via
    # take along axis on padded lanes
    @jax.jit
    def padded16(ps, idx):
        table = jnp.stack(ps + [ps[0]] * 5, axis=-1).reshape(H * W, 16)
        def body(_, carry):
            c, ii = carry
            v = jnp.take(table, ii, axis=0)
            c = c + v[..., :11].sum(-1)
            ii = (ii + (c > 1e30).astype(jnp.int32)) % (H * W)
            return (c, ii)
        c, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros((H, W)), idx))
        return c

    bench("row-gather padded (H*W,16)", padded16, planes, idx0)


if __name__ == "__main__":
    main()
